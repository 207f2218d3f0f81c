"""Attention ops library: shapes + oracle checks vs vendored torch math."""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.attention_zoo import (
    CBAMChannelGate,
    ECAAttention,
    ExternalAttention,
    ScaledDotProductAttention,
    SEAttention,
    SimplifiedScaledDotProductAttention,
)


def test_external_attention_matches_torch_math():
    import torch

    rng = np.random.default_rng(0)
    B, N, D, S = 3, 7, 16, 8
    x = rng.standard_normal((B, N, D)).astype(np.float32)

    mod = ExternalAttention(d_model=D, S=S)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    mk = np.asarray(params["params"]["mk"])
    mv = np.asarray(params["params"]["mv"])
    # vendored math (attention:/ExternalAttention.py:32-36)
    attn = torch.softmax(torch.tensor(x @ mk), dim=1)
    attn = attn / attn.sum(-1, keepdim=True)
    expected = (attn.numpy() @ mv)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_scaled_dot_product_attention_shapes():
    rng = np.random.default_rng(1)
    B, N, D = 2, 5, 32
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    mod = ScaledDotProductAttention(d_model=D, d_k=8, d_v=8, h=4)
    params = mod.init(jax.random.PRNGKey(0), x, x, x)
    out = mod.apply(params, x, x, x, deterministic=True)
    assert out.shape == (B, N, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_simplified_attention_is_softmax_attention_plus_fc_o():
    rng = np.random.default_rng(2)
    B, N, D, h = 2, 4, 8, 2
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    mod = SimplifiedScaledDotProductAttention(h=h)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(x),
                    jnp.asarray(x), deterministic=True)

    d_k = D // h
    q = x.reshape(B, N, h, d_k)
    att = np.einsum("bqhd,bkhd->bhqk", q, q) / np.sqrt(d_k)
    att = np.exp(att - att.max(-1, keepdims=True))
    att /= att.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bkhd->bqhd", att, q).reshape(B, N, D)
    expected = (expected @ np.asarray(params["params"]["fc_o_kernel"])
                + np.asarray(params["params"]["fc_o_bias"]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_aft_full_matches_torch_math():
    import torch

    rng = np.random.default_rng(4)
    B, n, D = 2, 6, 8
    x = rng.standard_normal((B, n, D)).astype(np.float32)
    from ser_tpu.ops.attention_zoo import AFTFull

    mod = AFTFull(d_model=D, n=n)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    p = params["params"]
    q = x @ np.asarray(p["fc_q_kernel"]) + np.asarray(p["fc_q_bias"])
    k = x @ np.asarray(p["fc_k_kernel"]) + np.asarray(p["fc_k_bias"])
    v = x @ np.asarray(p["fc_v_kernel"]) + np.asarray(p["fc_v_bias"])
    pos = np.asarray(p["position_biases"])
    # literal reference math (attention:/AFT.py:30-35)
    kt = torch.tensor(k).view(1, B, n, D)
    vt = torch.tensor(v).view(1, B, n, D)
    num = torch.sum(torch.exp(kt + torch.tensor(pos).view(n, 1, n, 1)) * vt,
                    dim=2)
    den = torch.sum(torch.exp(kt + torch.tensor(pos).view(n, 1, n, 1)), dim=2)
    expected = torch.sigmoid(torch.tensor(q)) * (num / den).permute(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mobilevitv2_and_ufo_shapes():
    from ser_tpu.ops.attention_zoo import MobileViTv2Attention, UFOAttention

    rng = np.random.default_rng(5)
    B, n, D = 2, 5, 16
    x = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))

    m = MobileViTv2Attention(d_model=D)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (B, n, D)

    u = UFOAttention(d_model=D, d_k=4, d_v=4, h=4)
    out = u.apply(u.init(jax.random.PRNGKey(0), x, x, x), x, x, x)
    assert out.shape == (B, n, D)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_modules_shapes():
    from ser_tpu.ops.attention_zoo import (
        CBAMBlock,
        DoubleAttention,
        SpatialGroupEnhance,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 6, 6)).astype(np.float32))

    cbam = CBAMBlock(channel=16, reduction=4, kernel_size=5)
    out = cbam.apply(cbam.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == x.shape

    a2 = DoubleAttention(in_channels=16, c_m=8, c_n=8)
    out = a2.apply(a2.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == x.shape

    sge = SpatialGroupEnhance(groups=4)
    out = sge.apply(sge.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_channel_gates_shapes_and_range():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 4)).astype(np.float32))
    for mod in (SEAttention(channel=16, reduction=4),
                ECAAttention(kernel_size=3),
                CBAMChannelGate(channel=16, reduction=4)):
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == x.shape
        # gated output is elementwise x * sigmoid(...) in (0,1)
        ratio = np.asarray(out) / (np.asarray(x) + 1e-9)
        assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Round-2 tranche: weight-transfer oracles vs the ACTUAL vendored torch
# modules (each imported standalone from /root/reference/attention:/).
# ---------------------------------------------------------------------------

import os

import pytest

pytestmark = pytest.mark.medium

REF_ATT = "/root/reference/attention:"

ref_available = pytest.mark.skipif(
    not os.path.isdir(REF_ATT), reason="reference checkout not available")


def _load_ref(name):
    import importlib.util
    import sys
    import types

    sys.modules.setdefault("imp", types.ModuleType("imp"))
    if "model" not in sys.modules:
        m = types.ModuleType("model")
        m.__path__ = ["/root/reference/model"]
        sys.modules["model"] = m
    if "model.attention" not in sys.modules:
        ma = types.ModuleType("model.attention")
        ma.__path__ = [REF_ATT]
        sys.modules["model.attention"] = ma
        sys.modules["model"].attention = ma
    spec = importlib.util.spec_from_file_location(
        f"refatt_{name}", os.path.join(REF_ATT, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cw(t):  # torch conv OIHW -> HWIO
    return np.asarray(t.detach()).transpose(2, 3, 1, 0)


def _lw(t):  # torch linear [out, in] -> [in, out]
    return np.asarray(t.detach()).T


def _a(t):
    return np.asarray(t.detach())


def _bn(prefix, bn):
    return {f"{prefix}_scale": _a(bn.weight), f"{prefix}_bias": _a(bn.bias),
            f"{prefix}_mean": _a(bn.running_mean),
            f"{prefix}_var": _a(bn.running_var)}


def _run(mod, params, *args, **kwargs):
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return np.asarray(mod.apply({"params": params}, *args, **kwargs))


def _close(ours, theirs, rtol=1e-4, atol=1e-4):
    np.testing.assert_allclose(ours, _a(theirs), rtol=rtol, atol=atol)


@ref_available
def test_sk_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import SKAttention

    ref_mod = _load_ref("SKAttention")
    torch.manual_seed(0)
    ref = ref_mod.SKAttention(channel=16, kernels=[1, 3], reduction=4, L=8)
    ref.eval()
    x = np.random.default_rng(0).standard_normal((2, 16, 6, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {"fc_kernel": _lw(ref.fc.weight), "fc_bias": _a(ref.fc.bias)}
    for i, k in enumerate((1, 3)):
        conv = ref.convs[i]
        params[f"conv{k}_kernel"] = _cw(conv.conv.weight)
        params[f"conv{k}_bias"] = _a(conv.conv.bias)
        params.update(_bn(f"bn{k}", conv.bn))
        params[f"fcs{i}_kernel"] = _lw(ref.fcs[i].weight)
        params[f"fcs{i}_bias"] = _a(ref.fcs[i].bias)
    out = _run(SKAttention(channel=16, kernels=(1, 3), reduction=4, L=8),
               params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_bam_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import BAMBlock

    ref_mod = _load_ref("BAM")
    torch.manual_seed(1)
    ref = ref_mod.BAMBlock(channel=16, reduction=4, dia_val=2)
    ref.eval()
    x = np.random.default_rng(1).standard_normal((2, 16, 7, 7)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {}
    for i in range(3):
        fc = ref.ca.ca.get_submodule(f"fc{i}")
        bn = ref.ca.ca.get_submodule(f"bn{i}")
        params[f"ca_fc{i}_kernel"] = _lw(fc.weight)
        params[f"ca_fc{i}_bias"] = _a(fc.bias)
        params.update(_bn(f"ca_bn{i}", bn))
    params["ca_last_fc_kernel"] = _lw(ref.ca.ca.last_fc.weight)
    params["ca_last_fc_bias"] = _a(ref.ca.ca.last_fc.bias)
    params["sa_reduce_kernel"] = _cw(ref.sa.sa.conv_reduce1.weight)
    params["sa_reduce_bias"] = _a(ref.sa.sa.conv_reduce1.bias)
    params.update(_bn("sa_reduce_bn", ref.sa.sa.bn_reduce1))
    for i in range(3):
        params[f"sa_conv{i}_kernel"] = _cw(
            ref.sa.sa.get_submodule(f"conv_{i}").weight)
        params[f"sa_conv{i}_bias"] = _a(
            ref.sa.sa.get_submodule(f"conv_{i}").bias)
        params.update(_bn(f"sa_bn{i}", ref.sa.sa.get_submodule(f"bn_{i}")))
    params["sa_last_conv_kernel"] = _cw(ref.sa.sa.last_conv.weight)
    params["sa_last_conv_bias"] = _a(ref.sa.sa.last_conv.bias)
    out = _run(BAMBlock(channel=16, reduction=4, dia_val=2), params,
               jnp.asarray(x))
    _close(out, want)


@ref_available
def test_psa_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import PSA

    ref_mod = _load_ref("PSA")
    torch.manual_seed(2)
    ref = ref_mod.PSA(channel=16, reduction=4, S=4)
    ref.eval()
    x = np.random.default_rng(2).standard_normal((2, 16, 6, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {}
    for i in range(4):
        params[f"conv{i}_kernel"] = _cw(ref.convs[i].weight)
        params[f"conv{i}_bias"] = _a(ref.convs[i].bias)
        params[f"se{i}_fc1_kernel"] = _cw(ref.se_blocks[i][1].weight)
        params[f"se{i}_fc2_kernel"] = _cw(ref.se_blocks[i][3].weight)
    out = _run(PSA(channel=16, reduction=4, S=4), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_emsa_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import EMSA

    ref_mod = _load_ref("EMSA")
    torch.manual_seed(3)
    ref = ref_mod.EMSA(d_model=16, d_k=4, d_v=4, h=2, H=4, W=4, ratio=2,
                       apply_transform=True)
    ref.eval()
    x = np.random.default_rng(3).standard_normal((2, 16, 16)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(x), torch.tensor(x))

    params = {}
    for n in ("q", "k", "v", "o"):
        fc = getattr(ref, f"fc_{n}")
        params[f"fc_{n}_kernel"] = _lw(fc.weight)
        params[f"fc_{n}_bias"] = _a(fc.bias)
    params["sr_conv_kernel"] = _cw(ref.sr_conv.weight)
    params["sr_conv_bias"] = _a(ref.sr_conv.bias)
    params["sr_ln_scale"] = _a(ref.sr_ln.weight)
    params["sr_ln_bias"] = _a(ref.sr_ln.bias)
    params["transform_conv_kernel"] = _cw(ref.transform.conv.weight)
    params["transform_conv_bias"] = _a(ref.transform.conv.bias)
    out = _run(EMSA(d_model=16, d_k=4, d_v=4, h=2, H=4, W=4, ratio=2),
               params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    _close(out, want)


@ref_available
def test_cot_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import CoTAttention

    ref_mod = _load_ref("CoTAttention")
    torch.manual_seed(4)
    ref = ref_mod.CoTAttention(dim=16, kernel_size=3)
    ref.eval()
    x = np.random.default_rng(4).standard_normal((2, 16, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {
        "key_conv_kernel": _cw(ref.key_embed[0].weight),
        "value_conv_kernel": _cw(ref.value_embed[0].weight),
        "att_conv1_kernel": _cw(ref.attention_embed[0].weight),
        "att_conv2_kernel": _cw(ref.attention_embed[3].weight),
        "att_conv2_bias": _a(ref.attention_embed[3].bias),
    }
    params.update(_bn("key_bn", ref.key_embed[1]))
    params.update(_bn("value_bn", ref.value_embed[1]))
    params.update(_bn("att_bn", ref.attention_embed[1]))
    out = _run(CoTAttention(dim=16), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_coord_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import CoordAttention

    ref_mod = _load_ref("CoordAttention")
    torch.manual_seed(5)
    ref = ref_mod.CoordAtt(inp=16, oup=16, reduction=4)
    ref.eval()
    x = np.random.default_rng(5).standard_normal((2, 16, 5, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {
        "conv1_kernel": _cw(ref.conv1.weight),
        "conv1_bias": _a(ref.conv1.bias),
        "conv_h_kernel": _cw(ref.conv_h.weight),
        "conv_h_bias": _a(ref.conv_h.bias),
        "conv_w_kernel": _cw(ref.conv_w.weight),
        "conv_w_bias": _a(ref.conv_w.bias),
    }
    params.update(_bn("bn1", ref.bn1))
    out = _run(CoordAttention(inp=16, oup=16, reduction=4), params,
               jnp.asarray(x))
    _close(out, want)


@ref_available
def test_triplet_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import TripletAttention

    ref_mod = _load_ref("TripletAttention")
    torch.manual_seed(6)
    ref = ref_mod.TripletAttention()
    ref.eval()
    x = np.random.default_rng(6).standard_normal((2, 16, 5, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {}
    for name in ("cw", "hc", "hw"):
        gate = getattr(ref, name)
        params[f"{name}_conv_kernel"] = _cw(gate.conv.conv.weight)
        params.update(_bn(f"{name}_bn", gate.conv.bn))
    out = _run(TripletAttention(), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_shuffle_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import ShuffleAttention

    ref_mod = _load_ref("ShuffleAttention")
    torch.manual_seed(7)
    ref = ref_mod.ShuffleAttention(channel=16, G=2)
    ref.eval()
    x = np.random.default_rng(7).standard_normal((2, 16, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {
        "cweight": _a(ref.cweight), "cbias": _a(ref.cbias),
        "sweight": _a(ref.sweight), "sbias": _a(ref.sbias),
        "gn_scale": _a(ref.gn.weight), "gn_bias": _a(ref.gn.bias),
    }
    out = _run(ShuffleAttention(channel=16, G=2), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_muse_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import MUSEAttention

    ref_mod = _load_ref("MUSEAttention")
    torch.manual_seed(8)
    ref = ref_mod.MUSEAttention(d_model=16, d_k=4, d_v=4, h=2)
    ref.eval()
    x = np.random.default_rng(8).standard_normal((2, 6, 16)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(x), torch.tensor(x))

    params = {"dy_paras": _a(ref.dy_paras)}
    for n in ("q", "k", "v", "o"):
        fc = getattr(ref, f"fc_{n}")
        params[f"fc_{n}_kernel"] = _lw(fc.weight)
        params[f"fc_{n}_bias"] = _a(fc.bias)
    params["conv1_point_kernel"] = _a(
        ref.conv1.pointwise_conv.weight)[:, :, 0].T
    params["conv1_point_bias"] = _a(ref.conv1.pointwise_conv.bias)
    for k in (3, 5):
        conv = getattr(ref, f"conv{k}")
        params[f"conv{k}_depth_kernel"] = _a(
            conv.depth_conv.weight)[:, 0, :].T
        params[f"conv{k}_depth_bias"] = _a(conv.depth_conv.bias)
        params[f"conv{k}_point_kernel"] = _a(
            conv.pointwise_conv.weight)[:, :, 0].T
        params[f"conv{k}_point_bias"] = _a(conv.pointwise_conv.bias)
    out = _run(MUSEAttention(d_model=16, d_k=4, d_v=4, h=2), params,
               jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    _close(out, want)


@ref_available
def test_s2_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import S2Attention

    ref_mod = _load_ref("S2Attention")
    torch.manual_seed(9)
    # the vendored S2Attention hardcodes SplitAttention(channel=512), so it
    # only runs at channels=512
    ref = ref_mod.S2Attention(channels=512)
    ref.eval()
    x = np.random.default_rng(9).standard_normal((1, 512, 4, 4)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {
        "mlp1_kernel": _lw(ref.mlp1.weight), "mlp1_bias": _a(ref.mlp1.bias),
        "mlp2_kernel": _lw(ref.mlp2.weight), "mlp2_bias": _a(ref.mlp2.bias),
        "sa_mlp1_kernel": _lw(ref.split_attention.mlp1.weight),
        "sa_mlp2_kernel": _lw(ref.split_attention.mlp2.weight),
    }
    out = _run(S2Attention(channels=512), params, jnp.asarray(x))
    _close(out, want, rtol=2e-4, atol=2e-4)


@ref_available
@pytest.mark.parametrize("sequential", [False, True])
def test_polarized_attention_vs_vendored(sequential):
    import torch

    from ser_tpu.ops.attention_zoo import PolarizedSelfAttention

    ref_mod = _load_ref("PolarizedSelfAttention")
    torch.manual_seed(10)
    cls = (ref_mod.SequentialPolarizedSelfAttention if sequential
           else ref_mod.ParallelPolarizedSelfAttention)
    ref = cls(channel=16)
    ref.eval()
    x = np.random.default_rng(10).standard_normal((2, 16, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {"ln_scale": _a(ref.ln.weight), "ln_bias": _a(ref.ln.bias)}
    for n in ("ch_wv", "ch_wq", "ch_wz", "sp_wv", "sp_wq"):
        conv = getattr(ref, n)
        params[f"{n}_kernel"] = _cw(conv.weight)
        params[f"{n}_bias"] = _a(conv.bias)
    out = _run(PolarizedSelfAttention(channel=16, sequential=sequential),
               params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_danet_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo import DAModule

    ref_mod = _load_ref("DANet")
    torch.manual_seed(11)
    ref = ref_mod.DAModule(d_model=512, kernel_size=3, H=7, W=7)
    ref.eval()
    x = np.random.default_rng(11).standard_normal((1, 512, 7, 7)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    pam = ref.position_attention_module
    cam = ref.channel_attention_module
    params = {
        "pos_cnn_kernel": _cw(pam.cnn.weight),
        "pos_cnn_bias": _a(pam.cnn.bias),
        "chan_cnn_kernel": _cw(cam.cnn.weight),
        "chan_cnn_bias": _a(cam.cnn.bias),
        "pa": {},
        "ca": {"fc_o_kernel": _lw(cam.pa.fc_o.weight),
               "fc_o_bias": _a(cam.pa.fc_o.bias)},
    }
    for n in ("q", "k", "v", "o"):
        fc = getattr(pam.pa, f"fc_{n}")
        params["pa"][f"fc_{n}_kernel"] = _lw(fc.weight)
        params["pa"][f"fc_{n}_bias"] = _a(fc.bias)
    out = _run(DAModule(d_model=512), params, jnp.asarray(x))
    _close(out, want, rtol=2e-4, atol=2e-4)
