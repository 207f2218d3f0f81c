"""Basic layers with PyTorch-default initialization semantics."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ser_tpu.ops import init as tinit


class TorchLinear(nn.Module):
    """``nn.Linear`` equivalent: y = x @ kernel + bias.

    Kernel layout is flax-style [in, out]; init matches torch defaults
    (U(+-1/sqrt(fan_in)) for both kernel and bias).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", tinit.torch_linear_kernel(self.dtype), (fan_in, self.features)
        )
        y = jnp.matmul(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", tinit.torch_linear_bias(fan_in, self.dtype), (self.features,)
            )
            y = y + bias
        return y


class TorchLayerNorm(nn.Module):
    """``nn.LayerNorm(d, eps=1e-6)`` equivalent over the last axis."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", tinit.ones, (d,))
        bias = self.param("bias", tinit.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return y * scale + bias


def dropout(x, rate: float, deterministic: bool, rng):
    """Functional inverted dropout matching ``torch.nn.Dropout``.

    Mask bits come from the hardware RngBitGenerator (unsafe_rbg) seeded by
    the given threefry key: software threefry costs ~45 us per million mask
    elements on v5e where the hardware generator is ~free, and the big
    attention-map masks ([B, h, L, L], [B, D, D]) dominate train-step RNG
    cost. Keys are still derived by threefry splits, so streams stay
    independent; only per-key bit generation changes backend."""
    if deterministic or rate == 0.0:
        return x
    import jax

    keep = 1.0 - rate
    rbg = jax.random.wrap_key_data(jnp.tile(rng, 2), impl="unsafe_rbg")
    mask = jax.random.bernoulli(rbg, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


class Dropout(nn.Module):
    """Module dropout pulling keys from the 'dropout' rng stream."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return dropout(x, self.rate, False, self.make_rng("dropout"))
