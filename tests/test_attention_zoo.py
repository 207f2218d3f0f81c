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


def test_simplified_attention_is_plain_softmax_attention():
    rng = np.random.default_rng(2)
    B, N, D, h = 2, 4, 8, 2
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    mod = SimplifiedScaledDotProductAttention(h=h)
    out = mod.apply({"params": {}}, jnp.asarray(x), jnp.asarray(x),
                    jnp.asarray(x), deterministic=True)

    d_k = D // h
    q = x.reshape(B, N, h, d_k)
    att = np.einsum("bqhd,bkhd->bhqk", q, q) / np.sqrt(d_k)
    att = np.exp(att - att.max(-1, keepdims=True))
    att /= att.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bkhd->bqhd", att, q).reshape(B, N, D)
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
