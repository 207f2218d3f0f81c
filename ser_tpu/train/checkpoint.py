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


def flatten_params(params, sep="/"):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = sep.join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[name] = np.asarray(leaf)
    return flat


def unflatten_into(params, flat, sep="/"):
    """Rebuild a pytree with the same structure as ``params`` taking values
    from ``flat`` when present (by flattened name)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        name = sep.join(p.key if hasattr(p, "key") else str(p.idx) for p in path)
        if name in flat:
            new_leaves.append(jnp.asarray(flat[name], dtype=leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


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
    with open(path, "wb") as f:
        f.write(buf.getvalue())


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
