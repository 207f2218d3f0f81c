"""Full-sequence LSTM ops — torch ``nn.LSTM`` equivalents as scans.

Used by the BiLSTM baseline (``/root/reference/model/lstm.py:71-72``) and the
degenerate MARN (``model/HybridRNN.py:83-84``). TPU-first: the x-side
projections for the whole sequence are one MXU matmul outside the scan; the
backward direction processes the time-flipped padded sequence exactly like
torch's bidirectional LSTM on unpacked padded input (padding included).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops.cells import declare_rnn_linear, torch_lstm_gates


def lstm_scan(x_proj, hh_kernel, hh_bias, reverse=False):
    """Run an LSTM over [L, B, 4H] precomputed input projections."""
    H = hh_kernel.shape[0]
    B = x_proj.shape[1]

    def step(carry, xp):
        h, c = carry
        sums = xp + jnp.matmul(h, hh_kernel) + hh_bias
        c, h = torch_lstm_gates(sums, c)
        return (h, c), h

    init = (jnp.zeros((B, H), x_proj.dtype), jnp.zeros((B, H), x_proj.dtype))
    _, ys = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return ys


class TorchGRU(nn.Module):
    """``nn.GRU(input, hidden)`` (single direction) on time-major [L, B, D].

    Returns (outputs [L, B, H], h_last [B, H]).
    """

    hidden: int

    @nn.compact
    def __call__(self, x, h0=None):
        from ser_tpu.ops.cells import gru_step

        H = self.hidden
        D = x.shape[-1]
        wih, bih = declare_rnn_linear(self, "weight_ih_l0", D, 3 * H, H)
        whh, bhh = declare_rnn_linear(self, "weight_hh_l0", H, 3 * H, H)

        x_proj = jnp.matmul(x, wih) + bih
        B = x.shape[1]
        if h0 is None:
            h0 = jnp.zeros((B, H), x.dtype)

        def step(h, xp):
            h = gru_step(xp, h, whh, bhh)
            return h, h

        h_last, ys = jax.lax.scan(step, h0, x_proj)
        return ys, h_last


class TorchBiLSTM(nn.Module):
    """``nn.LSTM(input, hidden, bidirectional=True)`` on time-major [L, B, D].

    Returns [L, B, 2H] (forward | backward concat, torch layout). The
    backward pass runs over the full padded sequence in reverse, matching
    torch's behavior on unpacked padded input.
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        H = self.hidden
        D = x.shape[-1]
        wih_f, bih_f = declare_rnn_linear(self, "weight_ih_l0", D, 4 * H, H)
        whh_f, bhh_f = declare_rnn_linear(self, "weight_hh_l0", H, 4 * H, H)
        wih_b, bih_b = declare_rnn_linear(self, "weight_ih_l0_reverse", D, 4 * H, H)
        whh_b, bhh_b = declare_rnn_linear(self, "weight_hh_l0_reverse", H, 4 * H, H)

        y_f = lstm_scan(jnp.matmul(x, wih_f) + bih_f, whh_f, bhh_f)
        y_b = lstm_scan(jnp.matmul(x, wih_b) + bih_b, whh_b, bhh_b, reverse=True)
        return jnp.concatenate([y_f, y_b], axis=-1)
