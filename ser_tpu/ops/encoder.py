"""Transformer encoder block (utterance-sequence encoder).

TPU-native re-implementation of the reference encoder
(``/root/reference/model/encoder.py:7-133``): MultiHeadAttention with separate
q-dim / kv-dim projections (no biases), scaled-dot-product attention with
dropout *after* softmax, residual + LayerNorm(eps=1e-6), and a two-layer
position-wise FFN.  All attention heads are computed as one batched einsum so
XLA tiles the contraction onto the MXU.

Shapes are batch-first: x is [B, L, d_model].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ser_tpu.ops.layers import Dropout, TorchLayerNorm, TorchLinear


class MultiHeadAttention(nn.Module):
    """Multi-head attention (ref ``model/encoder.py:7-60``).

    q has feature dim ``d_model``; k/v have ``d_model2``. The three input
    projections and the output projection are bias-free Linears.
    """

    n_head: int
    d_model: int
    d_model2: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        n_head, d_k, d_v = self.n_head, self.d_k, self.d_v
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]

        residual = q

        qh = TorchLinear(n_head * d_k, use_bias=False, name="w_qs")(q)
        kh = TorchLinear(n_head * d_k, use_bias=False, name="w_ks")(k)
        vh = TorchLinear(n_head * d_v, use_bias=False, name="w_vs")(v)

        qh = qh.reshape(B, Lq, n_head, d_k)
        kh = kh.reshape(B, Lk, n_head, d_k)
        vh = vh.reshape(B, Lk, n_head, d_v)

        # [B, n, Lq, Lk] — scale q before the contraction, like the reference.
        attn = jnp.einsum("bqnd,bknd->bnqk", qh / (d_k ** 0.5), kh)
        if mask is not None:
            # mask: [B, 1, Lk] or [B, Lq, Lk]; 0 -> masked out.
            attn = jnp.where(mask[:, None, ...] == 0, -1e9, attn)
        attn = nn.softmax(attn, axis=-1)
        attn = Dropout(self.dropout, name="attn_dropout")(attn, deterministic)

        out = jnp.einsum("bnqk,bknd->bqnd", attn, vh).reshape(B, Lq, n_head * d_v)
        out = TorchLinear(self.d_model, use_bias=False, name="fc")(out)
        out = Dropout(self.dropout, name="out_dropout")(out, deterministic)
        out = out + residual
        out = TorchLayerNorm(name="layer_norm")(out)
        return out, attn


class PositionwiseFeedForward(nn.Module):
    """Two-layer FFN with residual + LayerNorm (ref ``model/encoder.py:89-113``)."""

    d_in: int
    d_hid: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        h = TorchLinear(self.d_hid, name="w_1")(x)
        h = nn.relu(h)
        h = TorchLinear(self.d_in, name="w_2")(h)
        h = Dropout(self.dropout, name="drop")(h, deterministic)
        h = h + residual
        h = TorchLayerNorm(name="layer_norm")(h)
        # The reference declares (but never uses) an ``fc`` Linear(d_in, 100)
        # (``model/encoder.py:99,111``). We materialize it for parameter-count
        # parity with the reference's "Model para number" report.
        _ = TorchLinear(100, name="fc")(jnp.zeros((1, self.d_in), x.dtype))
        return h


class EncoderLayer(nn.Module):
    """MHA + FFN encoder block (ref ``model/encoder.py:116-133``)."""

    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, slf_attn_mask=None, deterministic: bool = True):
        from ser_tpu import config

        if config.ENCODER_ATTENTION != "mha":
            # live attention-zoo surface (config.ENCODER_ATTENTION / CLI
            # --encoder_attention): swap the MHA for a catalog sequence op
            # with the same residual/LN epilogue; no attention map to return
            from ser_tpu.ops.encoder_attention import ZooSelfAttention

            out = ZooSelfAttention(
                config.ENCODER_ATTENTION, self.d_model, self.dropout,
                name="slf_attn",
            )(x, deterministic=deterministic)
            attn = None
        else:
            out, attn = MultiHeadAttention(
                self.n_head,
                self.d_model,
                self.d_model,
                self.d_k,
                self.d_v,
                self.dropout,
                name="slf_attn",
            )(x, x, x, mask=slf_attn_mask, deterministic=deterministic)
        out = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, name="pos_ffn"
        )(out, deterministic=deterministic)
        return out, attn
