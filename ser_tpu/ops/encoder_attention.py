"""Pluggable encoder self-attention — the attention catalog as a LIVE surface.

The reference vendors 37 attention modules (``/root/reference/attention:/``)
and imports ExternalAttention into three model files
(``model/lsthm_sps.py:8``, ``lsthm_onlysp.py:8``, ``lsthm_nsps.py:8``)
without ever instantiating it. Here the catalog is actually usable:
``config.ENCODER_ATTENTION`` (CLI ``--encoder_attention``) selects a
sequence-shaped catalog op to replace the ``EncoderLayer``'s multi-head
self-attention, wrapped in the same epilogue the reference MHA uses
(dropout -> residual -> LayerNorm, ``model/encoder.py:52-58``) so the
block contract (shape, normalization) is preserved.

Only ops whose parameter shapes are independent of the sequence length are
offered (length-bucketed batches re-jit per L; params must not): that
excludes e.g. AFTFull's [n, n] position biases. UFOAttention is also
excluded: its XNorm divides by a raw row norm with no epsilon
(``attention:/UFOAttention.py:8-10``, faithfully ported), which NaNs on
the all-zero padded rows every bucketed batch contains.
"""

from __future__ import annotations

import flax.linen as nn

from ser_tpu.ops.attention_zoo import (
    ExternalAttention,
    MobileViTv2Attention,
    MUSEAttention,
    ScaledDotProductAttention,
    SimplifiedScaledDotProductAttention,
)
from ser_tpu.ops.layers import Dropout, TorchLayerNorm

# name -> constructor(d_model) for sequence ops on [B, L, D]; "mha" is the
# reference's own MultiHeadAttention and is handled by EncoderLayer itself.
SEQUENCE_KINDS = (
    "mha", "external", "self", "simplified_self", "mobilevit_v2", "muse",
)


def _heads(d_model):
    """Largest head count in {8, 4, 2, 1} dividing d_model (d_model=100
    for the text/audio encoders -> 4 heads of 25)."""
    for h in (8, 4, 2):
        if d_model % h == 0:
            return h
    return 1


class ZooSelfAttention(nn.Module):
    """A catalog sequence op + the reference MHA's residual/LN epilogue."""

    kind: str
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D = self.d_model
        residual = x
        if self.kind == "external":
            out = ExternalAttention(D, name="op")(x)
        elif self.kind == "self":
            h = _heads(D)
            out = ScaledDotProductAttention(
                D, D // h, D // h, h, name="op")(
                x, x, x, deterministic=deterministic)
        elif self.kind == "simplified_self":
            out = SimplifiedScaledDotProductAttention(
                _heads(D), name="op")(x, x, x, deterministic=deterministic)
        elif self.kind == "mobilevit_v2":
            out = MobileViTv2Attention(D, name="op")(x)
        elif self.kind == "muse":
            h = _heads(D)
            out = MUSEAttention(D, D // h, D // h, h, name="op")(
                x, x, x, deterministic=deterministic)
        else:
            raise ValueError(
                f"unknown encoder attention '{self.kind}'; "
                f"choose from {SEQUENCE_KINDS}")
        out = Dropout(self.dropout, name="out_dropout")(out, deterministic)
        out = TorchLayerNorm(name="layer_norm")(out + residual)
        return out
