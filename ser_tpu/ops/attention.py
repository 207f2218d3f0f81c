"""Cross-modal attention ops.

Re-implementations of the reference's three CrossAttention flavours
(``/root/reference/model/lsthm_onlysp.py:47-129``), all ones-initialized as in
the reference.

The per-step ``CrossAttention`` is the recurrence's throughput limiter: the
reference materializes rank-1 outer products Q = x1 (x) Wq and K = x2 (x) Wk
and runs two [B, D, D] batched matmuls per time step (O(B*D^3) FLOPs). Because
Q and K are rank-1, the logits collapse algebraically:

    logits[b, i, k] = x1[b, i] * (Wq . x2[b]) / sqrt(D) * Wk[k]

so we compute one [B] dot product, one outer product, and a fused
softmax-weighted reduction — O(B*D^2), ~2*D fewer FLOPs, no batched matmuls
inside the scan. ``rank1_cross_attention_naive`` keeps the literal formulation
as the oracle for tests.

The [B, D, D] logits/softmax/dropout-mask intermediates are never written to
HBM: the softmax max is exact in O(B*D) via the rank-1 structure
(``max_k a*wk[k] = a>0 ? a*max(wk) : a*min(wk)``), so exp, the dropout mask,
and both reductions (weighted sum and normalizer) fuse into one VPU pass over
k. The whole op is ``jax.checkpoint``-ed, so the backward scan recomputes it
fused instead of loading saved [B, D, D] residuals — measured on v5e-1 this
is what makes the recurrence compute-bound instead of HBM-bound.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops import init as tinit
from ser_tpu.ops.layers import Dropout, TorchLayerNorm, dropout


def _rank1_fused_impl(x1, x2, wq, wk, rng, attn_dropout):
    D = x1.shape[-1]
    scale = 1.0 / (D ** 0.5)
    s = jnp.matmul(x2, wq) * scale  # [B] = (Wq . x2[b]) / sqrt(D)
    alpha = x1 * s[:, None]  # [B, D]
    # Exact row-max of the rank-1 logits alpha[b,i] * wk[k] in O(D): it is
    # alpha * max(wk) when alpha > 0 else alpha * min(wk) — the identical
    # float product jnp.max over k would select. stop_gradient matches
    # jax.nn.softmax's treatment of the subtracted max.
    m = jax.lax.stop_gradient(
        jnp.where(alpha > 0, alpha * jnp.max(wk), alpha * jnp.min(wk)))
    e = jnp.exp(alpha[:, :, None] * wk[None, None, :] - m[:, :, None])
    den = jnp.sum(e, axis=-1)  # softmax normalizer: pre-dropout
    if rng is not None:
        # The [B, D, D] mask is the recurrence's single biggest RNG draw;
        # software threefry costs ~58 us/step on v5e where the hardware
        # RngBitGenerator (unsafe_rbg) is ~free. The step key itself still
        # comes from a threefry split, so streams stay independent; only the
        # per-key bit generation changes backend.
        keep = 1.0 - attn_dropout
        rbg = jax.random.wrap_key_data(jnp.tile(rng, 2), impl="unsafe_rbg")
        mask = jax.random.bernoulli(rbg, p=keep, shape=e.shape)
        e = jnp.where(mask, e / keep, 0.0)
    num = jnp.sum(e * x2[:, None, :], axis=-1)
    return num / den


_rank1_fused = jax.checkpoint(_rank1_fused_impl, static_argnums=(5,))


def rank1_cross_attention(
    x1, x2, wq, wk, attn_dropout=0.2, deterministic=True, rng=None
):
    """Collapsed per-step cross attention (ref ``lsthm_onlysp.py:59-71``).

    Args:
      x1, x2: [B, D] current cell states of the two modalities.
      wq, wk: [D] ones-initialized projection vectors.

    Returns:
      [B, D] fused state z.
    """
    if deterministic or attn_dropout == 0.0:
        rng = None
    return _rank1_fused(x1, x2, wq, wk, rng, float(attn_dropout))


def _rank1_parts(x1, x2, wq, wk, rng, attn_dropout):
    """Shared forward math for the custom-VJP path. Must regenerate the
    dropout mask bit-identically to ``_rank1_fused_impl`` (same unsafe_rbg
    construction from the same step key)."""
    D = x1.shape[-1]
    scale = 1.0 / (D ** 0.5)
    s = jnp.matmul(x2, wq) * scale  # [B]
    alpha = x1 * s[:, None]  # [B, D]
    m = jnp.where(alpha > 0, alpha * jnp.max(wk), alpha * jnp.min(wk))
    e = jnp.exp(alpha[:, :, None] * wk[None, None, :] - m[:, :, None])
    den = jnp.sum(e, axis=-1)  # pre-dropout normalizer
    if rng is not None:
        keep = 1.0 - attn_dropout
        rbg = jax.random.wrap_key_data(jnp.tile(rng, 2), impl="unsafe_rbg")
        mask = jax.random.bernoulli(rbg, p=keep, shape=e.shape)
        u = jnp.where(mask, e / keep, 0.0)
    else:
        u = e
    num = jnp.sum(u * x2[:, None, :], axis=-1)
    return s, alpha, e, u, den, num


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rank1_fused_customvjp(x1, x2, wq, wk, rng, attn_dropout):
    *_, den, num = _rank1_parts(x1, x2, wq, wk, rng, attn_dropout)
    return num / den


def _rank1_vjp_fwd(x1, x2, wq, wk, rng, attn_dropout):
    *_, den, num = _rank1_parts(x1, x2, wq, wk, rng, attn_dropout)
    return num / den, (x1, x2, wq, wk, rng)


def _rank1_vjp_bwd(attn_dropout, res, g):
    """Analytic backward. With logits L[b,i,k] = alpha[b,i]*wk[k] - m[b,i]
    (m treated as constant, matching jax.nn.softmax), e = exp(L), u the
    dropped e, den = sum_k e, out = (sum_k u*x2)/den:

        de[b,i,k] = g/den * x2[b,k]*M/keep  -  g*out/den
        dL = de*e ; dalpha = sum_k dL*wk ; dwk = sum_{b,i} dL*alpha

    Everything reduces to five one-pass reductions over the recomputed e/u
    (A2, A3 over k; B1, B2, B3 over i) — no [B, D, D] residual is ever
    saved, and XLA fuses each pass like the forward."""
    x1, x2, wq, wk, rng = res
    D = x1.shape[-1]
    scale = 1.0 / (D ** 0.5)
    s, alpha, e, u, den, num = _rank1_parts(x1, x2, wq, wk, rng, attn_dropout)
    out = num / den
    gn = g / den
    gd = -g * out / den

    # Explicit multiply+sum (not einsum/matmul): these contractions have a
    # [B, D, D] operand, and a dot would both route through the MXU at bf16
    # default precision (1e-3 error vs the f32 autodiff) and materialize
    # the operand; elementwise+reduce stays f32 on the VPU and fuses with
    # the e/u recompute.
    x2wk = x2 * wk[None, :]  # [B, D]
    A2 = jnp.sum(u * x2wk[:, None, :], axis=-1)  # sum_k u*x2*wk -> [B, Di]
    A3 = jnp.sum(e * wk[None, None, :], axis=-1)  # sum_k e*wk -> [B, Di]
    dalpha = gn * A2 + gd * A3

    B1 = jnp.sum(gn[:, :, None] * u, axis=1)  # [B, Dk]
    B2 = jnp.sum((gn * alpha)[:, :, None] * u, axis=1)
    B3 = jnp.sum((gd * alpha)[:, :, None] * e, axis=1)
    dwk = jnp.sum(x2 * B2 + B3, axis=0)

    dx1 = dalpha * s[:, None]
    ds = jnp.sum(dalpha * x1, axis=-1)
    dx2 = B1 + ds[:, None] * (scale * wq)[None, :]
    dwq = scale * jnp.sum(ds[:, None] * x2, axis=0)
    drng = None if rng is None else np.zeros(rng.shape, jax.dtypes.float0)
    return dx1, dx2, dwq, dwk, drng


_rank1_fused_customvjp.defvjp(_rank1_vjp_fwd, _rank1_vjp_bwd)


def rank1_cross_attention_vjp(
    x1, x2, wq, wk, attn_dropout=0.2, deterministic=True, rng=None
):
    """``rank1_cross_attention`` with the hand-written VJP backward.

    Measured on v5e-1 (scripts/bench_attention_vjp.py): isolated fwd+bwd it
    beats the production checkpoint+autodiff 51 vs 85 us/pass, but inside
    the production 110-step scan it loses 11.6 vs 9.7 ms — XLA fuses the
    rematerialized autodiff backward better in-scan. Kept opt-in as the
    measured alternative; production uses ``rank1_cross_attention``."""
    if deterministic or attn_dropout == 0.0:
        rng = None
    return _rank1_fused_customvjp(x1, x2, wq, wk, rng, float(attn_dropout))


def rank1_cross_attention_naive(x1, x2, wq, wk):
    """Literal reference formulation (oracle; eval mode, no dropout)."""
    q = x1[:, :, None] * wq[None, None, :]  # [B, D, D]
    k = x2[:, :, None] * wk[None, None, :]  # [B, D, D]
    d = x1.shape[-1]
    attn = jax.nn.softmax(jnp.matmul(q / (d ** 0.5), k), axis=-1)
    return jnp.matmul(attn, x2[:, :, None])[..., 0]


class CrossAttentionSeq(nn.Module):
    """Sequence-level cross attention ``CrossAttention2``
    (ref ``lsthm_onlysp.py:75-101``).

    Dims are intentionally hard-coded in the reference's __init__ regardless
    of constructor args (dh=100, dk=dv=128); we expose them as fields with the
    same defaults. Weights are ones-initialized. Input/output are time-major
    [L, B, D].
    """

    dh: int = 100
    dk: int = 128
    dv: int = 128
    attn_dropout: float = 0.2

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True,
                 mode: str = "run"):
        wq = self.param("Wq", tinit.ones, (self.dh, self.dk))
        wk = self.param("Wk", tinit.ones, (self.dh, self.dk))
        wv = self.param("Wv", tinit.ones, (self.dh, self.dv))
        if mode == "gather":
            # expose params so the caller can run the pair-batched tail
            # (paired_attention_tail) with this module's weights.
            return wq, wk, wv

        x1b = jnp.swapaxes(x1, 0, 1)  # [B, L1, D1]
        x2b = jnp.swapaxes(x2, 0, 1)  # [B, L2, D2]
        q = jnp.matmul(x1b, wq)
        k = jnp.matmul(x2b, wk)
        v = jnp.matmul(x2b, wv)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q / (self.dk ** 0.5), k), axis=-1
        )
        attn = Dropout(self.attn_dropout, name="drop")(attn, deterministic)
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        return jnp.swapaxes(out, 0, 1)  # [L1, B, Dv]


class CrossAttentionReSeq(nn.Module):
    """Re-attention over an attention output ``CrossAttention3``
    (ref ``lsthm_onlysp.py:103-129``): same as CrossAttentionSeq but K/V
    project from dk/dv-sized inputs (the first attention's output)."""

    dh: int = 100
    dk: int = 128
    dv: int = 128
    attn_dropout: float = 0.2

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True,
                 mode: str = "run"):
        wq = self.param("Wq", tinit.ones, (self.dh, self.dk))
        wk = self.param("Wk", tinit.ones, (self.dk, self.dk))
        wv = self.param("Wv", tinit.ones, (self.dv, self.dv))
        if mode == "gather":
            return wq, wk, wv

        x1b = jnp.swapaxes(x1, 0, 1)
        x2b = jnp.swapaxes(x2, 0, 1)
        q = jnp.matmul(x1b, wq)
        k = jnp.matmul(x2b, wk)
        v = jnp.matmul(x2b, wv)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q / (self.dk ** 0.5), k), axis=-1
        )
        attn = Dropout(self.attn_dropout, name="drop")(attn, deterministic)
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        return jnp.swapaxes(out, 0, 1)


def paired_attention_tail(seq_mods, reseq_mods, x_first, x_second, v1, v2,
                          deterministic=True, rngs=(None, None)):
    """The flagship/sps post-recurrence tail as PAIR-BATCHED attention.

    The reference head (``lsthm_onlysp.py:287-293``) runs two structurally
    identical attention chains with different weights:

        attn1 = Seq(w*x_l, v*x_a);  attn1 = ReSeq(v*x_a, v1*attn1)
        attn2 = Seq(v*x_a, w*x_l);  attn2 = ReSeq(w*x_l, v2*attn2)

    Sequentially that is 8 small attention ops on [B, L, 100/128] operands.
    Here both chains of a stage ride a leading pair axis, so each stage is
    4 batched einsums + one softmax — identical math (the pair members
    never interact; maxerr == 0 vs the sequential form, pinned in
    tests/test_paired_tail.py). Gated by ``config.TAIL_PAIRED``; the
    standalone A/B measurement is scripts/profile_posthead.py.

    Args:
      seq_mods: (crossatt_l2a, crossatt_a2l) CrossAttentionSeq modules
        (params gathered via ``mode="gather"``).
      reseq_mods: (crossatt_l2a_1, crossatt_a2l_1) CrossAttentionReSeq.
      x_first: w * x_l, time-major [L, B, dh].
      x_second: v * x_a, time-major [L, B, dh].
      v1, v2: the stage-2 input scale params (shape [1]).
      rngs: two dropout keys (stage 1, stage 2) when not deterministic —
        one draw per stage over the stacked [2, B, L, L] attention (the
        RNG stream differs from the sequential form but is
        distributionally identical, same as the fused-directions scan).

    Returns:
      (attn1, attn2) time-major [L, B, dv].
    """
    Wq1, Wk1, Wv1 = seq_mods[0](x_first, x_second, mode="gather")
    Wq2, Wk2, Wv2 = seq_mods[1](x_second, x_first, mode="gather")
    Rq1, Rk1, Rv1 = reseq_mods[0](x_second, x_first, mode="gather")
    Rq2, Rk2, Rv2 = reseq_mods[1](x_first, x_second, mode="gather")
    dk = Wq1.shape[1]
    # The dropout rate comes from the modules themselves (not a separate
    # default): a non-default construction must not silently train at 0.2.
    rates = {m.attn_dropout for m in (*seq_mods, *reseq_mods)}
    assert len(rates) == 1, (
        f"paired_attention_tail requires one shared attn_dropout, got {rates}")
    attn_dropout = rates.pop()

    def pair_attn(x1s, x2s, Wq, Wk, Wv, rng):
        # x1s/x2s: [2, B, L, D*] batch-major; W*: [2, D*, DK]
        q = jnp.einsum("sbld,sdk->sblk", x1s, Wq)
        k = jnp.einsum("sbld,sdk->sblk", x2s, Wk)
        v = jnp.einsum("sbld,sdk->sblk", x2s, Wv)
        attn = jax.nn.softmax(
            jnp.einsum("sbqd,sbkd->sbqk", q / (dk ** 0.5), k), axis=-1)
        attn = dropout(attn, attn_dropout, deterministic, rng)
        return jnp.einsum("sbqk,sbkd->sbqd", attn, v)

    xf = jnp.swapaxes(x_first, 0, 1)   # [B, L, dh]
    xs = jnp.swapaxes(x_second, 0, 1)
    s1 = pair_attn(jnp.stack([xf, xs]), jnp.stack([xs, xf]),
                   jnp.stack([Wq1, Wq2]), jnp.stack([Wk1, Wk2]),
                   jnp.stack([Wv1, Wv2]), rngs[0])
    vs = jnp.stack([v1, v2]).reshape(2, 1, 1, 1)
    s2 = pair_attn(jnp.stack([xs, xf]), vs * s1,
                   jnp.stack([Rq1, Rq2]), jnp.stack([Rk1, Rk2]),
                   jnp.stack([Rv1, Rv2]), rngs[1])
    return jnp.swapaxes(s2[0], 0, 1), jnp.swapaxes(s2[1], 0, 1)


class CrossAttentionSeqLN(nn.Module):
    """nsps variant of CrossAttention2 with residual + LayerNorm
    (ref ``model/lsthm_nsps.py:75-108``): dims come from the constructor,
    the residual is the raw time-major x_1, and LayerNorm(dh, eps=1e-6)
    follows the add."""

    dh: int = 100
    dk: int = 128
    dv: int = 128
    attn_dropout: float = 0.2

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        wq = self.param("Wq", tinit.ones, (self.dh, self.dk))
        wk = self.param("Wk", tinit.ones, (self.dh, self.dk))
        wv = self.param("Wv", tinit.ones, (self.dh, self.dv))

        residual = x1  # [L, B, D1]
        x1b = jnp.swapaxes(x1, 0, 1)
        x2b = jnp.swapaxes(x2, 0, 1)
        q = jnp.matmul(x1b, wq)
        k = jnp.matmul(x2b, wk)
        v = jnp.matmul(x2b, wv)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q / (self.dk ** 0.5), k), axis=-1
        )
        attn = Dropout(self.attn_dropout, name="drop")(attn, deterministic)
        out = jnp.swapaxes(jnp.einsum("bqk,bkd->bqd", attn, v), 0, 1)
        out = TorchLayerNorm(name="layer_norm")(out + residual)
        return out
