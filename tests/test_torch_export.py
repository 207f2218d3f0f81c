"""Torch-format exporter: round-trip identity + reverse logit parity.

Two layers of proof that ``ser_tpu.compat.torch_export`` produces
checkpoints the reference stack can consume:

1. export -> import == identity for every registered model (the exporter
   is a mechanical inverse of the importer's key mapping, so any drift
   between the two fails here).
2. Reverse logit parity: OUR randomly-initialized params exported to a
   torch state dict, loaded into the ACTUAL reference module with
   ``strict=True`` (proving full key/shape coverage of the reference's
   state_dict), and the torch forward must match our forward per
   utterance — the mirror image of tests/test_logit_parity.py.

Reverse-parity cases are skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.medium

REFERENCE = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REFERENCE, "model"))


def _shim_reference():
    sys.modules.setdefault("imp", types.ModuleType("imp"))
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [os.path.join(REFERENCE, "model")]
    sys.modules.setdefault("models", models_pkg)
    att_pkg = types.ModuleType("attention")
    att_pkg.__path__ = [os.path.join(REFERENCE, "attention:")]
    sys.modules.setdefault("attention", att_pkg)


def _t(x):
    return np.asarray(x.detach().numpy())


def _init_params(name, seed=0):
    import jax

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    batch = {k: np.asarray(v) for k, v in
             synthetic_batch(L=8, B=2).items() if k != "vid"}
    import jax.numpy as jnp

    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    return spec, model, params, args


def _randomized(params, seed=1):
    """Replace every leaf with distinct random values (ones-init vectors
    would otherwise let a key mix-up among identical leaves pass).

    Values are fan-in scaled (torch-default-init magnitude): recurrences
    like DialogueRNN's 500-wide GRU chain amplify float noise chaotically
    under O(1)-scaled weights, which would swamp the layout check."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    new = []
    for l in leaves:
        scale = 1.0 / np.sqrt(l.shape[0]) if l.ndim >= 2 else 0.05
        new.append(np.asarray(scale * rng.standard_normal(l.shape),
                              dtype=l.dtype))
    return jax.tree_util.tree_unflatten(treedef, new)


@pytest.mark.parametrize("name", [
    "MARN1_onlysp", "MARN1_sps", "MARN1_sp", "MARN1_cf", "MARN1_mf",
    "MARN1_la", "MARN1_azs", "MARN1_nsps", "MARN1_no_en", "MARN1_newz",
    "BiLSTM", "MARN", "MARN_AT", "MARN_ATV", "DialogueRNN",
])
def test_export_import_roundtrip(name, tmp_path):
    import jax

    from ser_tpu.compat.torch_export import export_torch_checkpoint
    from ser_tpu.compat.torch_import import import_torch_checkpoint

    _, _, template, _ = _init_params(name)
    params = _randomized(template)

    path = str(tmp_path / "export.model")
    unexported = []
    export_torch_checkpoint(params, path, name, log=unexported.append)
    assert not unexported, unexported  # every param must have a torch home

    warnings = []
    back = import_torch_checkpoint(template, path, name,
                                   log=warnings.append)
    assert not warnings, warnings
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Reverse logit parity: exported checkpoint drives the real reference model.
# ---------------------------------------------------------------------------

def _make_inputs(L=12, B=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((L, B, 1124)).astype(np.float32)
    lengths = rng.integers(L // 2, L + 1, size=B)
    lengths[0] = L
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    sp = rng.integers(0, 2, size=(L, B))
    qmask = np.zeros((L, B, 2), dtype=np.float32)
    qmask[np.arange(L)[:, None], np.arange(B)[None, :], sp] = 1.0
    qmask *= umask.T[:, :, None]
    return x, qmask, umask


def _load_ref_strict(ref_cls_args, name, params, tmp_path):
    """Build the reference module and strict-load our exported checkpoint."""
    import torch

    from ser_tpu.compat.torch_export import export_state_dict

    ref_cls, ref_args, ref_kwargs = ref_cls_args
    torch.manual_seed(0)
    ref = ref_cls(*ref_args, **ref_kwargs)
    ref.eval()
    sd = export_state_dict(params, name, prefix="")
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    return ref


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not available")
@pytest.mark.parametrize("name", [
    "MARN1_onlysp", "MARN1_sps", "MARN1_newz", "BiLSTM", "MARN_ATV",
    "DialogueRNN",
])
def test_reverse_logit_parity(name, tmp_path):
    _shim_reference()
    import jax.numpy as jnp
    import torch

    spec, model, params, _ = _init_params(name, seed=42)
    params = _randomized(params, seed=43)

    x, qmask, umask = _make_inputs(seed=5)

    if name == "MARN1_onlysp":
        from models.lsthm_onlysp import MARN1_onlysp as RefCls

        ref = _load_ref_strict((RefCls, (6,), {}), name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x), torch.tensor(qmask),
                          torch.tensor(umask))[0]
        ours = model.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(qmask), jnp.asarray(umask),
                           deterministic=True)[0]
    elif name == "MARN1_sps":
        from models.lsthm_sps import MARN1_sps as RefCls

        ref = _load_ref_strict((RefCls, (6,), {}), name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x), torch.tensor(qmask),
                          torch.tensor(umask))[0]
        ours = model.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(qmask), jnp.asarray(umask),
                           deterministic=True)[0]
    elif name == "MARN1_newz":
        from models.lsthm_newz import MARN1_newz as RefCls

        ref = _load_ref_strict((RefCls, (), {}), name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x[:, :, :200]),
                          torch.tensor(qmask))[0]
        ours = model.apply({"params": params}, jnp.asarray(x[:, :, :200]),
                           jnp.asarray(qmask), jnp.asarray(umask),
                           deterministic=True)[0]
    elif name == "BiLSTM":
        from models.lstm import BiLSTM as RefCls

        ref = _load_ref_strict((RefCls, (), {}), name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x[:, :, :200]))[0]
        ours = model.apply({"params": params}, jnp.asarray(x[:, :, :200]),
                           deterministic=True)[0]
    elif name == "MARN_ATV":
        from models.HybridRNN_ATV import MARN as RefCls

        ref = _load_ref_strict((RefCls, (), {}), name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x[:, :, :712]))
        ours = model.apply({"params": params}, jnp.asarray(x[:, :, :712]),
                           deterministic=True)
    elif name == "DialogueRNN":
        from models.DialogueRNN import BiModel as RefCls

        ref = _load_ref_strict(
            (RefCls, (712, 500, 500, 300, 300),
             dict(n_classes=6, listener_state=True,
                  context_attention="general", dropout_rec=0.1,
                  dropout=0.1)),
            name, params, tmp_path)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x[:, :, :712]),
                          torch.tensor(qmask), torch.tensor(umask),
                          att2=True)[0]
        ours = model.apply({"params": params}, jnp.asarray(x[:, :, :712]),
                           jnp.asarray(qmask), jnp.asarray(umask),
                           deterministic=True)[0]

    ours, ref_np = np.asarray(ours), _t(ref_out)
    # padded rows may legitimately differ (the forward parity tests mask
    # them too): onlysp/sps emit [B*L, C] batch-major, DialogueRNN [L, B, C]
    if name in ("MARN1_onlysp", "MARN1_sps"):
        rows = umask.reshape(-1) > 0
        ours, ref_np = ours[rows], ref_np[rows]
    elif name == "DialogueRNN":
        rows = umask.T.reshape(-1) > 0
        ours = ours.reshape(-1, 6)[rows]
        ref_np = ref_np.reshape(-1, 6)[rows]
    np.testing.assert_allclose(ours, ref_np, rtol=2e-3, atol=1e-3)
