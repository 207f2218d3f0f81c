"""Per-utterance logit fidelity vs the reference PyTorch models.

The decisive parity test: copy a reference model's trained-format weights
into our JAX model and assert the eval-mode outputs match per utterance on
identical random inputs (same masks, variable lengths). This pins down gate
order, the twice-applied encoder, attention scaling, mask-aware reversal,
speaker scatter semantics, and the collapsed rank-1 attention all at once.

Skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference checkout not available",
)


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


def _linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _lin_kb(sd, prefix, name):
    return {
        f"{name}_kernel": _t(sd[f"{prefix}.weight"]).T,
        f"{name}_bias": _t(sd[f"{prefix}.bias"]),
    }


def _rnn_kb(sd, prefix, name):
    return {
        f"{name}_ih_kernel": _t(sd[f"{prefix}.weight_ih"]).T,
        f"{name}_ih_bias": _t(sd[f"{prefix}.bias_ih"]),
        f"{name}_hh_kernel": _t(sd[f"{prefix}.weight_hh"]).T,
        f"{name}_hh_bias": _t(sd[f"{prefix}.bias_hh"]),
    }


def _encoder(sd, prefix):
    return {
        "slf_attn": {
            "w_qs": {"kernel": _t(sd[f"{prefix}.slf_attn.w_qs.weight"]).T},
            "w_ks": {"kernel": _t(sd[f"{prefix}.slf_attn.w_ks.weight"]).T},
            "w_vs": {"kernel": _t(sd[f"{prefix}.slf_attn.w_vs.weight"]).T},
            "fc": {"kernel": _t(sd[f"{prefix}.slf_attn.fc.weight"]).T},
            "layer_norm": {
                "scale": _t(sd[f"{prefix}.slf_attn.layer_norm.weight"]),
                "bias": _t(sd[f"{prefix}.slf_attn.layer_norm.bias"]),
            },
        },
        "pos_ffn": {
            "w_1": _linear(sd, f"{prefix}.pos_ffn.w_1"),
            "w_2": _linear(sd, f"{prefix}.pos_ffn.w_2"),
            "fc": _linear(sd, f"{prefix}.pos_ffn.fc"),
            "layer_norm": {
                "scale": _t(sd[f"{prefix}.pos_ffn.layer_norm.weight"]),
                "bias": _t(sd[f"{prefix}.pos_ffn.layer_norm.bias"]),
            },
        },
    }


def _onlysp_cell(sd, prefix):
    p = {}
    for mod in ("l", "a"):
        for mat in ("W", "U", "V", "S"):
            p.update(_lin_kb(sd, f"{prefix}.lsthm_{mod}.{mat}",
                             f"lsthm_{mod}_{mat}"))
    p.update(_rnn_kb(sd, f"{prefix}.gru_s", "gru_s"))
    for cell in ("lstm_q0", "lstm_q1", "lstm_s"):
        p.update(_rnn_kb(sd, f"{prefix}.{cell}", cell))
    for att in ("crossatt_l2a", "crossatt_a2l"):
        for w in ("Wq", "Wk", "Wv"):
            p[f"{att}_{w}"] = _t(sd[f"{prefix}.{att}.{w}"]).reshape(-1)
    return p


def _crossatt(sd, prefix):
    return {w: _t(sd[f"{prefix}.{w}"]) for w in ("Wq", "Wk", "Wv")}


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


def test_onlysp_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_onlysp import MARN1_onlysp

    torch.manual_seed(0)
    ref = MARN1_onlysp(6)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "linear_in": _linear(sd, "linear_in"),
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "marn_cell_f": _onlysp_cell(sd, "marn_cell_f"),
        "marn_cell_b": _onlysp_cell(sd, "marn_cell_b"),
        "crossatt_l2a": _crossatt(sd, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(sd, "crossatt_a2l"),
        "crossatt_l2a_1": _crossatt(sd, "crossatt_l2a_1"),
        "crossatt_a2l_1": _crossatt(sd, "crossatt_a2l_1"),
        "w": _t(sd["w"]),
        "v": _t(sd["v"]),
        "v1": _t(sd["v1"]),
        "v2": _t(sd["v2"]),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

    x, qmask, umask = _make_inputs()
    with torch.no_grad():
        ref_logp, ref_xl, ref_xa = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    import jax
    import jax.numpy as jnp

    from ser_tpu.models.marn_onlysp import MARN1OnlySP

    model = MARN1OnlySP(n_classes=6)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(x), jnp.asarray(qmask), jnp.asarray(umask),
        deterministic=True)["params"]
    # structural check: our transfer covers every parameter
    import jax.tree_util as jtu

    init_names = {jtu.keystr(k) for k, _ in
                  jtu.tree_flatten_with_path(init)[0]}
    got_names = {jtu.keystr(k) for k, _ in
                 jtu.tree_flatten_with_path(params)[0]}
    assert init_names == got_names, (
        sorted(init_names - got_names), sorted(got_names - init_names))

    params = jax.tree_util.tree_map(jnp.asarray, params)
    logp, xl, xa = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(qmask),
        jnp.asarray(umask), deterministic=True)

    np.testing.assert_allclose(
        np.asarray(xl), _t(ref_xl), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(xa), _t(ref_xa), rtol=1e-4, atol=1e-4)
    # per-utterance logit fidelity on VALID rows (padded rows differ only
    # through the reference's unmasked sequence attention over padding)
    mask_rows = umask.reshape(-1) > 0
    ours = np.asarray(logp)[mask_rows]
    theirs = _t(ref_logp)[mask_rows]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
    # argmax agreement everywhere valid
    assert (ours.argmax(1) == theirs.argmax(1)).mean() == 1.0


def _check(model, params, args, ref_out, extract=None, rtol=1e-3, atol=3e-4,
           valid_mask=None):
    import jax
    import jax.numpy as jnp

    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        *args, deterministic=True)["params"]
    import jax.tree_util as jtu

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


def test_bilstm_logit_parity():
    _shim_reference()
    import torch

    from models.lstm import BiLSTM as TBiLSTM

    torch.manual_seed(1)
    ref = TBiLSTM()
    ref.eval()
    sd = ref.state_dict()

    def bilstm_params(prefix):
        return {
            "weight_ih_l0_kernel": _t(sd[f"{prefix}.weight_ih_l0"]).T,
            "weight_ih_l0_bias": _t(sd[f"{prefix}.bias_ih_l0"]),
            "weight_hh_l0_kernel": _t(sd[f"{prefix}.weight_hh_l0"]).T,
            "weight_hh_l0_bias": _t(sd[f"{prefix}.bias_hh_l0"]),
            "weight_ih_l0_reverse_kernel": _t(sd[f"{prefix}.weight_ih_l0_reverse"]).T,
            "weight_ih_l0_reverse_bias": _t(sd[f"{prefix}.bias_ih_l0_reverse"]),
            "weight_hh_l0_reverse_kernel": _t(sd[f"{prefix}.weight_hh_l0_reverse"]).T,
            "weight_hh_l0_reverse_bias": _t(sd[f"{prefix}.bias_hh_l0_reverse"]),
        }

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "lstm_l": bilstm_params("lstm_l"),
        "lstm_a": bilstm_params("lstm_a"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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
    sd = ref.state_dict()

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "encoder_v": _encoder(sd, "encoder_v"),
        "att_0_kernel": _t(sd["att.0.weight"]).T,
        "att_0_bias": _t(sd["att.0.bias"]),
        "fc_0_kernel": _t(sd["fc.0.weight"]).T,
        "fc_0_bias": _t(sd["fc.0.bias"]),
        "fc_3_kernel": _t(sd["fc.3.weight"]).T,
        "fc_3_bias": _t(sd["fc.3.bias"]),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }
    for m in ("l", "a", "v"):
        for mat in ("W", "U", "V"):
            params.update(_lin_kb(sd, f"lsthm_{m}.{mat}", f"lsthm_{m}_{mat}"))
        params[f"reduce_dim_nn_{m}_0_kernel"] = \
            _t(sd[f"reduce_dim_nn_{m}.0.weight"]).T
        params[f"reduce_dim_nn_{m}_0_bias"] = _t(sd[f"reduce_dim_nn_{m}.0.bias"])

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


def _sps_cell(sd, prefix):
    p = {}
    for mod in ("l", "a"):
        for mat in ("W", "U", "V", "S"):
            p.update(_lin_kb(sd, f"{prefix}.lsthm_{mod}.{mat}",
                             f"lsthm_{mod}_{mat}"))
    for cell in ("lstm_q0", "lstm_q1", "lstm_s"):
        p.update(_rnn_kb(sd, f"{prefix}.{cell}", cell))
    for att in ("crossatt_l2a", "crossatt_a2l"):
        for w in ("Wq", "Wk", "Wv"):
            p[f"{att}_{w}"] = _t(sd[f"{prefix}.{att}.{w}"]).reshape(-1)
    return p


def test_sps_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_sps import MARN1_sps

    torch.manual_seed(3)
    ref = MARN1_sps(6)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "linear_in": _linear(sd, "linear_in"),
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "marn_cell_f": _sps_cell(sd, "marn_cell_f"),
        "marn_cell_b": _sps_cell(sd, "marn_cell_b"),
        "crossatt_l2a": _crossatt(sd, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(sd, "crossatt_a2l"),
        "crossatt_l2a_1": _crossatt(sd, "crossatt_l2a_1"),
        "crossatt_a2l_1": _crossatt(sd, "crossatt_a2l_1"),
        "w": _t(sd["w"]),
        "v": _t(sd["v"]),
        "v1": _t(sd["v1"]),
        "v2": _t(sd["v2"]),
        "fc_0": _linear(sd, "fc.0"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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


def _rank1_atts(sd, prefix):
    p = {}
    for att in ("crossatt_l2a", "crossatt_a2l"):
        for w in ("Wq", "Wk", "Wv"):
            p[f"{att}_{w}"] = _t(sd[f"{prefix}.{att}.{w}"]).reshape(-1)
    return p


def _lsthm4(sd, prefix, name):
    p = {}
    for mat in ("W", "U", "V", "S"):
        p.update(_lin_kb(sd, f"{prefix}.{mat}", f"{name}_{mat}"))
    return p


def test_sp_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_sp import MARN1_sp

    torch.manual_seed(5)
    ref = MARN1_sp(6)
    ref.eval()
    sd = ref.state_dict()

    def cell(prefix):
        p = {}
        p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_q", "lsthm_q"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_s", "lstm_s"))
        p.update(_rank1_atts(sd, prefix))
        return p

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "marn_cell_f": cell("marn_cell_f"),
        "marn_cell_b": cell("marn_cell_b"),
        "crossatt_l2a": _crossatt(sd, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(sd, "crossatt_a2l"),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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
    sd = ref.state_dict()

    def cell(prefix):
        p = {}
        p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_s", "lstm_s"))
        p.update(_rank1_atts(sd, prefix))
        return p

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "marn_cell_f": cell("marn_cell_f"),
        "marn_cell_b": cell("marn_cell_b"),
        "crossatt_l2a": _crossatt(sd, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(sd, "crossatt_a2l"),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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


def _seq_atts(sd, prefix):
    p = {}
    for att in ("crossatt_l2a", "crossatt_a2l"):
        p[att] = {w: _t(sd[f"{prefix}.{att}.{w}"]) for w in ("Wq", "Wk", "Wv")}
    return p


def test_mf_logit_parity():
    _shim_reference()
    import torch

    from models.lsthm_mf import MARN1_mf

    torch.manual_seed(7)
    ref = MARN1_mf(6)
    ref.eval()
    sd = ref.state_dict()

    def cell(prefix):
        p = {}
        p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_s", "lstm_s"))
        p.update(_seq_atts(sd, prefix))
        p["encoder_l"] = _encoder(sd, f"{prefix}.encoder_l")
        p["encoder_a"] = _encoder(sd, f"{prefix}.encoder_a")
        return p

    params = {
        "marn_cell_f": cell("marn_cell_f"),
        "marn_cell_b": cell("marn_cell_b"),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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
    sd = ref.state_dict()

    def cell(prefix):
        p = {}
        p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_s", "lstm_s"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_la_l", "lstm_la_l"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_la_a", "lstm_la_a"))
        p.update(_seq_atts(sd, prefix))
        p["encoder_l"] = _encoder(sd, f"{prefix}.encoder_l")
        p["encoder_a"] = _encoder(sd, f"{prefix}.encoder_a")
        return p

    params = {
        "marn_cell_f": cell("marn_cell_f"),
        "marn_cell_b": cell("marn_cell_b"),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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
    sd = ref.state_dict()

    def cell(prefix):
        p = {}
        p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
        p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
        p.update(_rnn_kb(sd, f"{prefix}.lstm_s", "lstm_s"))
        p.update(_rank1_atts(sd, prefix))
        return p

    params = {
        "marn_cell_f": cell("marn_cell_f"),
        "marn_cell_b": cell("marn_cell_b"),
        "marn_cell_f_encoder_l": _encoder(sd, "marn_cell_f.encoder_l"),
        "marn_cell_f_encoder_a": _encoder(sd, "marn_cell_f.encoder_a"),
        "marn_cell_b_encoder_l": _encoder(sd, "marn_cell_b.encoder_l"),
        "marn_cell_b_encoder_a": _encoder(sd, "marn_cell_b.encoder_a"),
        "linear": _linear(sd, "linear"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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


def _nsps_cell(sd, prefix):
    p = {}
    p.update(_lsthm4(sd, f"{prefix}.lsthm_l", "lsthm_l"))
    p.update(_lsthm4(sd, f"{prefix}.lsthm_a", "lsthm_a"))
    p.update(_rnn_kb(sd, f"{prefix}.gru_s", "gru_s"))
    p.update(_rnn_kb(sd, f"{prefix}.gru_l", "gru_l"))
    p.update(_rank1_atts(sd, prefix))
    return p


def _crossatt_ln(sd, prefix):
    p = {w: _t(sd[f"{prefix}.{w}"]) for w in ("Wq", "Wk", "Wv")}
    p["layer_norm"] = {
        "scale": _t(sd[f"{prefix}.layer_norm.weight"]),
        "bias": _t(sd[f"{prefix}.layer_norm.bias"]),
    }
    return p


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
    sd = ref.state_dict()

    params = {
        "linear_in": _linear(sd, "linear_in"),
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "marn_cell_f": _nsps_cell(sd, "marn_cell_f"),
        "marn_cell_b": _nsps_cell(sd, "marn_cell_b"),
        "crossatt_l2a": _crossatt_ln(sd, "crossatt_l2a"),
        "crossatt_a2l": _crossatt_ln(sd, "crossatt_a2l"),
        "p": _t(sd["p"]),
        "fc_0": _linear(sd, "fc.0"),
        "fc2_0": _linear(sd, "fc2.0"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }

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
    sd = ref.state_dict()

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "encoder_v": _encoder(sd, "encoder_v"),
        "w": _t(sd["w"]),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }
    params.update(_lsthm4(sd, "lsthm_l", "lsthm_l"))
    params.update(_lsthm4(sd, "lsthm_a", "lsthm_a"))
    params.update(_lin_kb(sd, "S", "S"))
    params.update(_lin_kb(sd, "att.0", "att_0"))
    params.update(_lin_kb(sd, "att_l.0", "att_l_0"))
    params.update(_lin_kb(sd, "att_a.0", "att_a_0"))
    params.update(_lin_kb(sd, "att_cross_modal.0", "att_cross_modal_0"))
    params.update(_lin_kb(sd, "fc_z.0", "fc_z_0"))
    params.update(_lin_kb(sd, "fc.0", "fc_0"))
    params.update(_lin_kb(sd, "fc.3", "fc_3"))
    params.update(_lin_kb(sd, "g_attention.trans.0", "g_attention_trans_0"))
    params.update(_lin_kb(sd, "g_attention.trans.3", "g_attention_trans_3"))

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
    sd = ref.state_dict()

    def bilstm_params(prefix):
        return {
            "weight_ih_l0_kernel": _t(sd[f"{prefix}.weight_ih_l0"]).T,
            "weight_ih_l0_bias": _t(sd[f"{prefix}.bias_ih_l0"]),
            "weight_hh_l0_kernel": _t(sd[f"{prefix}.weight_hh_l0"]).T,
            "weight_hh_l0_bias": _t(sd[f"{prefix}.bias_hh_l0"]),
            "weight_ih_l0_reverse_kernel": _t(sd[f"{prefix}.weight_ih_l0_reverse"]).T,
            "weight_ih_l0_reverse_bias": _t(sd[f"{prefix}.bias_ih_l0_reverse"]),
            "weight_hh_l0_reverse_kernel": _t(sd[f"{prefix}.weight_hh_l0_reverse"]).T,
            "weight_hh_l0_reverse_bias": _t(sd[f"{prefix}.bias_hh_l0_reverse"]),
        }

    params = {
        "lstm_l": bilstm_params("lstm_l"),
        "lstm_a": bilstm_params("lstm_a"),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "att_0_kernel": _t(sd["att.0.weight"]).T,
        "att_0_bias": _t(sd["att.0.bias"]),
        "fc_0_kernel": _t(sd["fc.0.weight"]).T,
        "fc_0_bias": _t(sd["fc.0.bias"]),
        "fc_3_kernel": _t(sd["fc.3.weight"]).T,
        "fc_3_bias": _t(sd["fc.3.bias"]),
        "reduce_dim_nn_l_0_kernel": _t(sd["reduce_dim_nn_l.0.weight"]).T,
        "reduce_dim_nn_l_0_bias": _t(sd["reduce_dim_nn_l.0.bias"]),
        "reduce_dim_nn_a_0_kernel": _t(sd["reduce_dim_nn_a.0.weight"]).T,
        "reduce_dim_nn_a_0_bias": _t(sd["reduce_dim_nn_a.0.bias"]),
    }
    for m in ("l", "a"):
        for mat in ("W", "U", "V"):
            params.update(_lin_kb(sd, f"lsthm_{m}.{mat}", f"lsthm_{m}_{mat}"))

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
    sd = ref.state_dict()

    params = {
        "encoder_l": _encoder(sd, "encoder_l"),
        "encoder_a": _encoder(sd, "encoder_a"),
        "att_0_kernel": _t(sd["att.0.weight"]).T,
        "att_0_bias": _t(sd["att.0.bias"]),
        "fc_0_kernel": _t(sd["fc.0.weight"]).T,
        "fc_0_bias": _t(sd["fc.0.bias"]),
        "fc_3_kernel": _t(sd["fc.3.weight"]).T,
        "fc_3_bias": _t(sd["fc.3.bias"]),
        "nn_out_0": _linear(sd, "nn_out.0"),
        "nn_out_3": _linear(sd, "nn_out.3"),
    }
    for m in ("l", "a"):
        for mat in ("W", "U", "V"):
            params.update(_lin_kb(sd, f"lsthm_{m}.{mat}", f"lsthm_{m}_{mat}"))
        params[f"reduce_dim_nn_{m}_0_kernel"] = \
            _t(sd[f"reduce_dim_nn_{m}.0.weight"]).T
        params[f"reduce_dim_nn_{m}_0_bias"] = _t(sd[f"reduce_dim_nn_{m}.0.bias"])

    rng = np.random.default_rng(13)
    L, B = 9, 3
    x = rng.standard_normal((L, B, 200)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))

    import jax.numpy as jnp

    from ser_tpu.models.hybrid_rnn import MARNAttention

    _check(MARNAttention(n_classes=7, trimodal=False), params,
           (jnp.asarray(x),), _t(ref_out), extract=lambda out: out)


def _drnn_scan(sd, prefix):
    p = {}
    for cell in ("g_cell", "p_cell", "e_cell", "l_cell"):
        p.update(_rnn_kb(sd, f"{prefix}.dialogue_cell.{cell}", cell))
    p["attention_transform_kernel"] = \
        _t(sd[f"{prefix}.dialogue_cell.attention.transform.weight"]).T
    return p


def test_dialogue_rnn_logit_parity():
    _shim_reference()
    import torch

    from models.DialogueRNN import BiModel as TBiModel

    torch.manual_seed(4)
    ref = TBiModel(712, 500, 500, 300, 300, n_classes=6, listener_state=True,
                   context_attention="general", dropout_rec=0.1, dropout=0.1)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "dialog_rnn_f": _drnn_scan(sd, "dialog_rnn_f"),
        "dialog_rnn_r": _drnn_scan(sd, "dialog_rnn_r"),
        "matchatt_transform_kernel": _t(sd["matchatt.transform.weight"]).T,
        "matchatt_transform_bias": _t(sd["matchatt.transform.bias"]),
        "linear": _linear(sd, "linear"),
        "smax_fc": _linear(sd, "smax_fc"),
    }

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
