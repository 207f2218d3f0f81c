"""Attention ops vs oracles (collapsed rank-1 vs literal reference math)."""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.attention import (
    CrossAttentionReSeq,
    CrossAttentionSeq,
    CrossAttentionSeqLN,
    rank1_cross_attention,
    rank1_cross_attention_naive,
)


def test_rank1_collapse_equals_naive():
    rng = np.random.default_rng(0)
    B, D = 7, 128
    x1 = rng.standard_normal((B, D)).astype(np.float32)
    x2 = rng.standard_normal((B, D)).astype(np.float32)
    # non-trivial weights (post-training they diverge from ones)
    wq = (1.0 + 0.1 * rng.standard_normal(D)).astype(np.float32)
    wk = (1.0 + 0.1 * rng.standard_normal(D)).astype(np.float32)

    fast = rank1_cross_attention(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(wq), jnp.asarray(wk)
    )
    naive = rank1_cross_attention_naive(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(wq), jnp.asarray(wk)
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=1e-4,
                               atol=1e-5)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_cross_attention_seq_oracle():
    rng = np.random.default_rng(1)
    L, B, D = 9, 4, 100
    dk = dv = 128
    x1 = rng.standard_normal((L, B, D)).astype(np.float32)
    x2 = rng.standard_normal((L, B, D)).astype(np.float32)

    mod = CrossAttentionSeq(dh=D, dk=dk, dv=dv)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    out = mod.apply(params, jnp.asarray(x1), jnp.asarray(x2), deterministic=True)

    wq = np.asarray(params["params"]["Wq"])
    wk = np.asarray(params["params"]["Wk"])
    wv = np.asarray(params["params"]["Wv"])
    x1b = x1.transpose(1, 0, 2)
    x2b = x2.transpose(1, 0, 2)
    q = x1b @ wq
    k = x2b @ wk
    v = x2b @ wv
    attn = _softmax((q / np.sqrt(dk)) @ k.transpose(0, 2, 1))
    expected = (attn @ v).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_cross_attention_reseq_shapes_and_ones_init():
    rng = np.random.default_rng(2)
    L, B = 6, 3
    x1 = rng.standard_normal((L, B, 100)).astype(np.float32)
    x2 = rng.standard_normal((L, B, 128)).astype(np.float32)
    mod = CrossAttentionReSeq()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    assert np.all(np.asarray(params["params"]["Wq"]) == 1.0)
    assert params["params"]["Wq"].shape == (100, 128)
    assert params["params"]["Wk"].shape == (128, 128)
    out = mod.apply(params, jnp.asarray(x1), jnp.asarray(x2), deterministic=True)
    assert out.shape == (L, B, 128)


def test_cross_attention_seq_ln_residual():
    rng = np.random.default_rng(3)
    L, B, D = 5, 2, 100
    x1 = rng.standard_normal((L, B, D)).astype(np.float32)
    x2 = rng.standard_normal((L, B, D)).astype(np.float32)
    mod = CrossAttentionSeqLN(dh=D, dk=D, dv=D)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    out = mod.apply(params, jnp.asarray(x1), jnp.asarray(x2), deterministic=True)
    assert out.shape == (L, B, D)
    # LayerNorm output: zero mean / unit variance per row at ones-init scale
    o = np.asarray(out)
    np.testing.assert_allclose(o.mean(-1), 0.0, atol=1e-4)


def test_rank1_custom_vjp_grads_match_autodiff():
    """The opt-in hand-written VJP (measured alternative, see its docstring)
    must produce the same grads as checkpoint+autodiff — eval mode and train
    mode (same step key -> bit-identical dropout mask)."""
    from ser_tpu.ops.attention import (
        _rank1_fused, rank1_cross_attention_vjp)

    rng = np.random.default_rng(4)
    B, D = 5, 64
    x1 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    wq = jnp.asarray((1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    wk = jnp.asarray((1 + 0.1 * rng.standard_normal(D)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    for train in (False, True):
        r = key if train else None

        def loss_ref(x1, x2, wq, wk):
            return jnp.sum(jnp.sin(_rank1_fused(x1, x2, wq, wk, r, 0.2)))

        def loss_new(x1, x2, wq, wk):
            return jnp.sum(jnp.sin(rank1_cross_attention_vjp(
                x1, x2, wq, wk, 0.2, not train, r)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x1, x2, wq, wk)
        gn = jax.grad(loss_new, argnums=(0, 1, 2, 3))(x1, x2, wq, wk)
        for a, b, name in zip(gr, gn, ("x1", "x2", "wq", "wk")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                err_msg=f"train={train} d{name}")
