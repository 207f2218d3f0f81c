"""Recurrent-cell math — fused gate kernels for the LSTHM family.

The reference's hot inner kernels are:
- LSTHM (3-term): ``sums = W x + U h + V z`` -> f,i,o,c-hat gates
  (``/root/reference/model/HybridRNN.py:12-37``).
- LSTHM1 (4-term, speaker-conditioned): adds ``S s``
  (``model/lsthm_onlysp.py:11-44``).
- torch ``nn.LSTMCell`` / ``nn.GRUCell`` (used for speaker memories).

TPU-first design: the x-dependent projections of every step are batched into
one [L*B, in] @ [in, 4H] matmul *outside* the scan (MXU-friendly), and the
state-dependent projections inside the scan use a single fused
[h|z|s] @ [3H, 4H] matmul instead of three separate ones. Gate nonlinearity
order is preserved exactly:
- LSTHM order: f, i, o, c-hat (reference order).
- torch LSTM order: i, f, g, o.
- torch GRU order: r, z, n with ``n = tanh(x_n + r * (W_hn h + b_hn))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ser_tpu.ops import init as tinit


# ---------------------------------------------------------------------------
# Parameter declaration helpers (call inside a linen @nn.compact __call__).
# ---------------------------------------------------------------------------

def declare_linear(module, name, in_dim, out_dim, use_bias=True):
    """Declare a torch-default-initialized linear: returns (kernel, bias)."""
    kernel = module.param(
        f"{name}_kernel", tinit.torch_linear_kernel(), (in_dim, out_dim)
    )
    bias = None
    if use_bias:
        bias = module.param(
            f"{name}_bias", tinit.torch_linear_bias(in_dim), (out_dim,)
        )
    return kernel, bias


def declare_rnn_linear(module, name, in_dim, out_dim, hidden):
    """Declare an RNN-style linear (init U(+-1/sqrt(hidden)) like torch RNNs)."""
    kernel = module.param(
        f"{name}_kernel", tinit.torch_rnn_uniform(hidden), (in_dim, out_dim)
    )
    bias = module.param(f"{name}_bias", tinit.torch_rnn_uniform(hidden), (out_dim,))
    return kernel, bias


def affine(x, kernel, bias=None):
    y = jnp.matmul(x, kernel)
    if bias is not None:
        y = y + bias
    return y


# ---------------------------------------------------------------------------
# Gate math.
# ---------------------------------------------------------------------------

def lsthm_gates(sums, c_prev):
    """LSTHM gate nonlinearity (ref ``model/lsthm_onlysp.py:37-43``).

    ``sums`` is the 4H-wide pre-activation; order f, i, o, c-hat.
    Returns (c_t, h_t).
    """
    H = c_prev.shape[-1]
    f_t = jax.nn.sigmoid(sums[..., :H])
    i_t = jax.nn.sigmoid(sums[..., H : 2 * H])
    o_t = jax.nn.sigmoid(sums[..., 2 * H : 3 * H])
    ch_t = jnp.tanh(sums[..., 3 * H :])
    c_t = f_t * c_prev + i_t * ch_t
    h_t = jnp.tanh(c_t) * o_t
    return c_t, h_t


def lsthm_mf_gates(sums, z_gate, c_prev):
    """LSTHM 'mf' mutation: z acts as an extra memory-fusion forget gate.

    ``c = f*c + i*c-hat + sigmoid(V z) * c`` (ref ``model/lsthm_mf.py:40-41``).
    ``z_gate`` is the H-wide V(z) pre-activation.
    """
    H = c_prev.shape[-1]
    f_t = jax.nn.sigmoid(sums[..., :H])
    i_t = jax.nn.sigmoid(sums[..., H : 2 * H])
    o_t = jax.nn.sigmoid(sums[..., 2 * H : 3 * H])
    ch_t = jnp.tanh(sums[..., 3 * H :])
    zf_t = jax.nn.sigmoid(z_gate)
    c_t = f_t * c_prev + i_t * ch_t + zf_t * c_prev
    h_t = jnp.tanh(c_t) * o_t
    return c_t, h_t


def torch_lstm_gates(sums, c_prev):
    """torch ``nn.LSTMCell`` gate math: order i, f, g, o."""
    H = c_prev.shape[-1]
    i_t = jax.nn.sigmoid(sums[..., :H])
    f_t = jax.nn.sigmoid(sums[..., H : 2 * H])
    g_t = jnp.tanh(sums[..., 2 * H : 3 * H])
    o_t = jax.nn.sigmoid(sums[..., 3 * H :])
    c_t = f_t * c_prev + i_t * g_t
    h_t = o_t * jnp.tanh(c_t)
    return c_t, h_t


def gru_step(x_proj, h_prev, hh_kernel, hh_bias):
    """torch ``nn.GRUCell`` step with the x-side projection precomputed.

    Args:
      x_proj: [B, 3H] = x @ W_ih^T + b_ih (gate order r, z, n).
      h_prev: [B, H].
      hh_kernel: [H, 3H]; hh_bias: [3H].

    Returns:
      [B, H] next hidden state.
    """
    H = h_prev.shape[-1]
    h_proj = jnp.matmul(h_prev, hh_kernel) + hh_bias
    r = jax.nn.sigmoid(x_proj[..., :H] + h_proj[..., :H])
    z = jax.nn.sigmoid(x_proj[..., H : 2 * H] + h_proj[..., H : 2 * H])
    n = jnp.tanh(x_proj[..., 2 * H :] + r * h_proj[..., 2 * H :])
    return (1.0 - z) * n + z * h_prev


def lstm_step(x_proj, h_prev, c_prev, hh_kernel, hh_bias):
    """torch ``nn.LSTMCell`` step with the x-side projection precomputed.

    Args:
      x_proj: [B, 4H] = x @ W_ih^T + b_ih (gate order i, f, g, o).
      h_prev, c_prev: [B, H].
      hh_kernel: [H, 4H]; hh_bias: [4H].

    Returns:
      (h_t, c_t).
    """
    sums = x_proj + jnp.matmul(h_prev, hh_kernel) + hh_bias
    c_t, h_t = torch_lstm_gates(sums, c_prev)
    return h_t, c_t
