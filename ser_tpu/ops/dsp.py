"""Standalone DSP ops.

``pre_emphasis`` mirrors the reference's only DSP artifact — the
``PreEmphasis`` conv module (``/root/reference/utils.py:21-37``): a 1-D
filter y[t] = x[t] - coef * x[t-1] with reflect padding, expressed as pure
elementwise math (no conv needed on TPU — it fuses into whatever follows).
The full fused front-end lives in ``ser_tpu.ops.pallas.mfcc``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pre_emphasis(x, coef: float = 0.97):
    """x: [B, T] waveforms -> [B, T] pre-emphasized (reflect-padded)."""
    x_prev = jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
    return x - coef * x_prev
