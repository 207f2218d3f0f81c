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
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops import init as tinit
from ser_tpu.ops.layers import Dropout, TorchLayerNorm, dropout


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
    D = x1.shape[-1]
    scale = 1.0 / (D ** 0.5)
    s = jnp.matmul(x2, wq) * scale  # [B] = (Wq . x2[b]) / sqrt(D)
    alpha = x1 * s[:, None]  # [B, D]
    logits = alpha[:, :, None] * wk[None, None, :]  # [B, D, D]
    attn = jax.nn.softmax(logits, axis=-1)
    if not deterministic and attn_dropout > 0.0:
        attn = dropout(attn, attn_dropout, False, rng)
    return jnp.einsum("bik,bk->bi", attn, x2)


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
    def __call__(self, x1, x2, deterministic: bool = True):
        wq = self.param("Wq", tinit.ones, (self.dh, self.dk))
        wk = self.param("Wk", tinit.ones, (self.dh, self.dk))
        wv = self.param("Wv", tinit.ones, (self.dh, self.dv))

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
    def __call__(self, x1, x2, deterministic: bool = True):
        wq = self.param("Wq", tinit.ones, (self.dh, self.dk))
        wk = self.param("Wk", tinit.ones, (self.dk, self.dk))
        wv = self.param("Wv", tinit.ones, (self.dv, self.dv))

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
