"""Per-utterance logit fidelity vs the reference PyTorch models.

The decisive parity test: copy a reference model's trained-format weights
into our JAX model via the PRODUCT converter (``ser_tpu.compat.torch_import``)
and assert the eval-mode outputs match per utterance on identical random
inputs (same masks, variable lengths). This pins down gate order, the
twice-applied encoder, attention scaling, mask-aware reversal, speaker
scatter semantics, the collapsed rank-1 attention, AND the checkpoint
importer's key mapping all at once.

Skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

from ser_tpu.compat.torch_import import convert_state_dict

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.medium,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "model")),
        reason="reference checkout not available",
    ),
]


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


def _convert(name, sd):
    missing = []
    params = convert_state_dict(name, sd, log=missing.append)
    assert not missing, missing  # fresh reference state dicts are complete
    return params


def _make_inputs(L=14, B=4, seed=0):
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


def _check(model, params, args, ref_out, extract=None, rtol=1e-3, atol=3e-4,
           valid_mask=None):
    import jax
    import jax.numpy as jnp

    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        *args, deterministic=True)["params"]
    import jax.tree_util as jtu

    # structural check: the converter covers every parameter
    init_names = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(init)[0]}
    got_names = {jtu.keystr(k) for k, _ in
                 jtu.tree_flatten_with_path(params)[0]}
    assert init_names == got_names, (
        sorted(init_names - got_names), sorted(got_names - init_names))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = model.apply({"params": params}, *args, deterministic=True)
    ours = np.asarray(extract(out) if extract else out[0])
    if valid_mask is not None:
        ours = ours[valid_mask]
        ref_out = ref_out[valid_mask]
    np.testing.assert_allclose(ours, ref_out, rtol=rtol, atol=atol)
    assert (ours.argmax(1) == ref_out.argmax(1)).mean() == 1.0


def test_onlysp_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_onlysp import MARN1_onlysp

    torch.manual_seed(0)
    ref = MARN1_onlysp(6)
    ref.eval()
    params = _convert("MARN1_onlysp", ref.state_dict())

    x, qmask, umask = _make_inputs()
    with torch.no_grad():
        ref_logp, ref_xl, ref_xa = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    import jax
    import jax.numpy as jnp

    from ser_tpu.models.marn_onlysp import MARN1OnlySP

    model = MARN1OnlySP(n_classes=6)
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    logp, xl, xa = model.apply(
        {"params": jparams}, jnp.asarray(x), jnp.asarray(qmask),
        jnp.asarray(umask), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(xl), _t(ref_xl), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(xa), _t(ref_xa), rtol=1e-4, atol=1e-4)

    # full structural + per-utterance check via the shared helper
    mask_rows = umask.reshape(-1) > 0
    _check(model, params,
           (jnp.asarray(x), jnp.asarray(qmask), jnp.asarray(umask)),
           _t(ref_logp), rtol=1e-3, atol=2e-4, valid_mask=mask_rows)


def test_bilstm_logit_parity():
    _shim_reference()
    import torch

    from models.lstm import BiLSTM as TBiLSTM

    torch.manual_seed(1)
    ref = TBiLSTM()
    ref.eval()
    params = _convert("BiLSTM", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=1)
    with torch.no_grad():
        ref_out, _, _ = ref(torch.tensor(x[:, :, :200]))

    import jax.numpy as jnp

    from ser_tpu.models.bilstm import BiLSTM

    _check(BiLSTM(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]),), _t(ref_out))


def test_marn_atv_logit_parity():
    _shim_reference()
    import torch

    from models.HybridRNN_ATV import MARN as TMARN_ATV

    torch.manual_seed(2)
    ref = TMARN_ATV()
    ref.eval()
    params = _convert("MARN_ATV", ref.state_dict())

    rng = np.random.default_rng(7)
    L, B = 9, 3
    x = rng.standard_normal((L, B, 712)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))

    import jax.numpy as jnp

    from ser_tpu.models.hybrid_rnn import MARNAttention

    _check(MARNAttention(n_classes=6, trimodal=True), params,
           (jnp.asarray(x),), _t(ref_out),
           extract=lambda out: out)


def test_sps_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_sps import MARN1_sps

    torch.manual_seed(3)
    ref = MARN1_sps(6)
    ref.eval()
    params = _convert("MARN1_sps", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=3)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1SPS

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1SPS(n_classes=6), params,
           (jnp.asarray(x), jnp.asarray(qmask), jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_sp_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_sp import MARN1_sp

    torch.manual_seed(5)
    ref = MARN1_sp(6)
    ref.eval()
    params = _convert("MARN1_sp", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=5)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1SP

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1SP(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_cf_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_cf import MARN1_cf

    torch.manual_seed(6)
    ref = MARN1_cf(6)
    ref.eval()
    params = _convert("MARN1_cf", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=6)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1CF

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1CF(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_mf_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_mf import MARN1_mf

    torch.manual_seed(7)
    ref = MARN1_mf(6)
    ref.eval()
    params = _convert("MARN1_mf", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=7)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1MF

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1MF(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_la_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_la import MARN1_la

    torch.manual_seed(8)
    ref = MARN1_la(6)
    ref.eval()
    params = _convert("MARN1_la", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=8)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1LA

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1LA(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_azs_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_azs import MARN1_azs

    torch.manual_seed(9)
    ref = MARN1_azs(6)
    ref.eval()
    params = _convert("MARN1_azs", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=9)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1AZS

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1AZS(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


@pytest.mark.parametrize("variant", ["nsps", "no_en"])
def test_nsps_logit_parity(variant):
    _shim_reference()
    import torch

    if variant == "nsps":
        from models.lsthm_nsps import MARN1_nsps as RefCls
    else:
        from models.lsthm_no_en import MARN1_no_en as RefCls

    torch.manual_seed(10)
    ref = RefCls(6, "IEMOCAP")
    ref.eval()
    params = _convert(
        "MARN1_nsps" if variant == "nsps" else "MARN1_no_en",
        ref.state_dict())

    x, qmask, umask = _make_inputs(seed=10)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1NSPS

    mask_rows = umask.reshape(-1) > 0
    _check(MARN1NSPS(n_classes=6, use_text_encoder=(variant == "nsps")),
           params,
           (jnp.asarray(x), jnp.asarray(qmask), jnp.asarray(umask)),
           _t(ref_out), valid_mask=mask_rows)


def test_newz_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_newz import MARN1_newz

    torch.manual_seed(11)
    ref = MARN1_newz()
    ref.eval()
    params = _convert("MARN1_newz", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=11)
    with torch.no_grad():
        ref_out, _, _ = ref(torch.tensor(x[:, :, :200]), torch.tensor(qmask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_newz import MARN1NewZ

    _check(MARN1NewZ(n_classes=6), params,
           (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
            jnp.asarray(umask)),
           _t(ref_out))


def test_marn_degenerate_logit_parity():
    _shim_reference()
    import torch

    from models.HybridRNN import MARN as TMARN

    torch.manual_seed(12)
    ref = TMARN()
    ref.eval()
    params = _convert("MARN", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=12)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x[:, :, :200]))

    import jax.numpy as jnp

    from ser_tpu.models.hybrid_rnn import MARN

    _check(MARN(n_classes=6), params, (jnp.asarray(x[:, :, :200]),),
           _t(ref_out), extract=lambda out: out)


def test_marn_at_logit_parity():
    _shim_reference()
    import torch

    from models.HybridRNN_AT import MARN as TMARN_AT

    torch.manual_seed(13)
    ref = TMARN_AT()
    ref.eval()
    params = _convert("MARN_AT", ref.state_dict())

    rng = np.random.default_rng(13)
    L, B = 9, 3
    x = rng.standard_normal((L, B, 200)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))

    import jax.numpy as jnp

    from ser_tpu.models.hybrid_rnn import MARNAttention

    _check(MARNAttention(n_classes=7, trimodal=False), params,
           (jnp.asarray(x),), _t(ref_out), extract=lambda out: out)


def test_dialogue_rnn_logit_parity():
    _shim_reference()
    import torch

    from models.DialogueRNN import BiModel as TBiModel

    torch.manual_seed(4)
    ref = TBiModel(712, 500, 500, 300, 300, n_classes=6, listener_state=True,
                   context_attention="general", dropout_rec=0.1, dropout=0.1)
    ref.eval()
    params = _convert("DialogueRNN", ref.state_dict())

    x, qmask, umask = _make_inputs(seed=4)
    U = x[:, :, :712]
    with torch.no_grad():
        ref_logp, _, _, _ = ref(
            torch.tensor(U), torch.tensor(qmask), torch.tensor(umask),
            att2=True)
    ref_flat = _t(ref_logp).transpose(1, 0, 2).reshape(-1, 6)

    import jax.numpy as jnp

    from ser_tpu.models.dialogue_rnn import BiModel

    model = BiModel(D_m=712, D_g=500, D_p=500, D_e=300, D_h=300, n_classes=6,
                    listener_state=True, context_attention="general",
                    dropout_rec=0.1, dropout=0.1)

    def extract(out):
        lp = out[0]
        return jnp.swapaxes(lp, 0, 1).reshape(-1, 6)

    mask_rows = umask.reshape(-1) > 0
    _check(model, params,
           (jnp.asarray(U), jnp.asarray(qmask), jnp.asarray(umask)),
           ref_flat, extract=extract, valid_mask=mask_rows)
