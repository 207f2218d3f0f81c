"""Parameter initializers matching PyTorch layer defaults.

The reference framework relies on PyTorch's default initialization everywhere
(plus explicit ``torch.ones`` for the fusion/attention weights, e.g.
``/root/reference/model/lsthm_onlysp.py:53-55,250-256``).  Matching these
distributions is required for accuracy parity, since the models are small and
init-sensitive.

PyTorch defaults reproduced here:
- ``nn.Linear``: weight ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform
  with a=sqrt(5) collapses to this), bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``nn.LSTM/LSTMCell/GRUCell``: every weight/bias ~ U(-1/sqrt(hidden), ...).
- ``nn.LayerNorm``: weight=1, bias=0.
- ``nn.Parameter(torch.ones(...))``: ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel(dtype=jnp.float32):
    """Kernel init for a Dense layer with flax layout [in, out]."""

    def init(key, shape, dtype=dtype):
        fan_in = shape[0]
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias(fan_in: int, dtype=jnp.float32):
    """Bias init for a Dense layer; torch uses U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=dtype):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_rnn_uniform(hidden_size: int, dtype=jnp.float32):
    """Init for all RNN-cell weights/biases: U(+-1/sqrt(hidden_size))."""

    def init(key, shape, dtype=dtype):
        bound = 1.0 / (hidden_size ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)
