"""Checkpointing with the reference's tolerant partial-load semantics.

The reference saves the model state dict per test_step epoch
(``model_trainer.py:170-171``; optimizer state intentionally NOT saved) and
loads tolerantly: unknown names are skipped with a print, size mismatches are
skipped with a print, and a legacy "module." prefix is stripped
(``model_trainer.py:173-187``). We reproduce all of that over a flattened
param pytree stored as an .npz of "a/b/c" -> array.
"""

from __future__ import annotations

import io
import os

import jax
import jax.numpy as jnp
import numpy as np


def _key_str(p):
    """One path entry -> string (DictKey .key, SequenceKey .idx,
    GetAttrKey .name — optax states are namedtuples)."""
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def flatten_params(params, sep="/"):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = sep.join(_key_str(p) for p in path)
        flat[name] = np.asarray(leaf)
    return flat


def unflatten_into(params, flat, sep="/"):
    """Rebuild a pytree with the same structure as ``params`` taking values
    from ``flat`` when present (by flattened name)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        name = sep.join(_key_str(p) for p in path)
        if name in flat:
            new_leaves.append(jnp.asarray(flat[name], dtype=leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _atomic_write(path, data: bytes):
    """Write via tmp + os.replace so an interrupted save never truncates an
    existing file — ``--resume latest``'s restart loop depends on
    ``last.state`` either being the old complete state or the new one."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_train_state(path, params, opt_state, extra=None):
    """Full-resume checkpoint: params + optimizer state + scalar extras
    (epoch counter, dropout RNG key) in one .npz.

    The reference never saves optimizer state (``model_trainer.py:170-171``
    stores the model state dict only), so a resumed run restarts Adam's
    moments from zero. This opt-in surface (``train.py --save_state /
    --resume``) makes resumption exact: same params, same Adam m/v/count,
    same LR schedule position, same dropout key stream.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {"params/" + k: v for k, v in flatten_params(params).items()}
    flat.update(
        {"opt/" + k: v for k, v in flatten_params(opt_state).items()})
    for k, v in (extra or {}).items():
        flat["extra/" + k] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    _atomic_write(path, buf.getvalue())


def load_train_state(path, params, opt_state):
    """Strict inverse of ``save_train_state`` (own format — no tolerant
    semantics): returns (params, opt_state, extra_dict)."""
    with np.load(path, allow_pickle=False) as z:
        loaded = {k: z[k] for k in z.files}
    p_flat = {k[len("params/"):]: v for k, v in loaded.items()
              if k.startswith("params/")}
    o_flat = {k[len("opt/"):]: v for k, v in loaded.items()
              if k.startswith("opt/")}
    extra = {k[len("extra/"):]: v for k, v in loaded.items()
             if k.startswith("extra/")}
    missing = set(flatten_params(params)) - set(p_flat)
    if missing:
        raise ValueError(f"train-state file missing params: {sorted(missing)[:5]}")
    missing_o = set(flatten_params(opt_state)) - set(o_flat)
    if missing_o:
        raise ValueError(
            f"train-state file missing optimizer leaves: {sorted(missing_o)[:5]}")
    return (unflatten_into(params, p_flat),
            unflatten_into(opt_state, o_flat), extra)


def save_parameters_orbax(params, path):
    """Orbax backend (async-capable, sharding-aware) for large-scale runs.

    The default .npz path (``save_parameters``) is the right tool at this
    model scale (~2.6M params); orbax is provided for multi-host /
    async-save deployments (SURVEY §5.3).
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_parameters_orbax(params, path):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), params)


def save_parameters(params, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_params(params)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    _atomic_write(path, buf.getvalue())


def load_parameters(params, path, log=print):
    """Tolerant load: returns a new param pytree; skips unknown names and
    shape mismatches with warnings, strips a leading 'module.'/'model.'
    prefix (DataParallel fossil, ``model_trainer.py:179``)."""
    self_flat = flatten_params(params)
    with np.load(path, allow_pickle=False) as z:
        loaded = {k: z[k] for k in z.files}

    accepted = {}
    for origname, value in loaded.items():
        name = origname
        if name not in self_flat:
            for prefix in ("module.", "module/", "model.", "model/"):
                if name.startswith(prefix) and name[len(prefix):] in self_flat:
                    name = name[len(prefix):]
                    break
        if name not in self_flat:
            log(f"{origname} is not in the model.")
            continue
        if tuple(self_flat[name].shape) != tuple(value.shape):
            log(
                f"Wrong parameter length: {origname}, model: "
                f"{tuple(self_flat[name].shape)}, loaded: {tuple(value.shape)}"
            )
            continue
        accepted[name] = value

    return unflatten_into(params, accepted)
