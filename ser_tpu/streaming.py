"""Stateful streaming inference for unidirectional models (MARN1_newz).

The batch serving path (``ser_tpu/serving.py``) recomputes the FULL dialogue
per predict — O(L) serial recurrence steps per new utterance as a
conversation grows. MARN1_newz's recurrence is unidirectional
(``models/marn_newz.py``; ref ``model/lsthm_newz.py:60-110`` runs one
forward pass, no ``_reverse_seq``), so the scan carry can persist across
calls: appending one utterance costs ONE recurrence step plus one
encoder-row attention over the history — O(1) serial work instead of L
steps.

Exactness contract
------------------
The reference's sequence encoders are BIDIRECTIONAL over utterances
(``model/encoder.py:7-60``: softmax over all L rows), so appending an
utterance changes the encoder outputs of every PAST utterance. Exact
streaming (emit-once, never revise) is therefore semantically impossible
for any model in this zoo — that includes the unidirectional ones; the
bidirectional-recurrence models (onlysp, sps, DialogueRNN, ...) are doubly
so (their backward scan consumes the future). The streaming path instead
computes the model with a CAUSAL encoder: utterance t's encoder output
attends over utterances 0..t only. That is a precise, testable spec —
``NewZStream`` output == ``MARN1NewZ(causal_encoder=True)`` batch forward
(pinned to ~1e-5 in ``tests/test_streaming.py``) — and its drift vs the
bidirectional batch forward is a measured property of the deployment, not
an accumulation artifact (``serve.py stream`` reports it).

Engineering shape
-----------------
One jitted step, static shapes: history buffers are padded to ``max_len``
and masked by the live length, so every ``append`` reuses a single XLA
program (no per-length recompiles — the same trick as the serving buckets).
State lives on device between calls; only the [C]-sized logits row is
fetched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.cells import lsthm_gates
from ser_tpu.ops.masking import select_parties


def _linear(p, name, x):
    y = jnp.matmul(x, p[f"{name}_kernel"])
    b = p.get(f"{name}_bias")
    return y if b is None else y + b


def _layer_norm(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y * p["scale"] + p["bias"]


def _encoder_row(enc, hist, row, length, n_head=8, d_k=40, d_v=40):
    """One encoder output row: q = the new utterance, k/v = the history
    (rows < length), mirroring ops/encoder.py::MultiHeadAttention +
    PositionwiseFeedForward deterministically at Lq=1.

    hist: [Lmax, d]; row: [d]; length: [] int32 (includes the new row).
    """
    att = enc["slf_attn"]
    Lmax, d = hist.shape
    qh = jnp.matmul(row, att["w_qs"]["kernel"]).reshape(n_head, d_k)
    kh = jnp.matmul(hist, att["w_ks"]["kernel"]).reshape(Lmax, n_head, d_k)
    vh = jnp.matmul(hist, att["w_vs"]["kernel"]).reshape(Lmax, n_head, d_v)
    logits = jnp.einsum("nd,knd->nk", qh / (d_k ** 0.5), kh)
    live = jnp.arange(Lmax) < length
    logits = jnp.where(live[None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nk,knd->nd", attn, vh).reshape(n_head * d_v)
    out = jnp.matmul(out, att["fc"]["kernel"]) + row  # residual
    out = _layer_norm(att["layer_norm"], out)

    ffn = enc["pos_ffn"]
    h = jnp.matmul(out, ffn["w_1"]["kernel"]) + ffn["w_1"]["bias"]
    h = jax.nn.relu(h)
    h = jnp.matmul(h, ffn["w_2"]["kernel"]) + ffn["w_2"]["bias"]
    h = _layer_norm(ffn["layer_norm"], h + out)
    return h


def _cell_step(p, carry, xl_enc, xa_enc, q_row, H=128, K=4):
    """One deterministic MARN1_newz recurrence step + head
    (models/marn_newz.py step(); ref lsthm_newz.py:60-110)."""
    D = 2 * H
    h_l, c_l, h_a, c_a, z, q = carry
    qm = q_row[None, :]  # [1, P]

    q0_sel = select_parties(q, qm)
    q_affine = _linear(p, "S", q0_sel)
    m = qm[:, :, None]
    q = q0_sel[:, None, :] * (1.0 - m) + q_affine[:, None, :] * m

    xlp = _linear(p, "lsthm_l_W", xl_enc[None, :])
    xap = _linear(p, "lsthm_a_W", xa_enc[None, :])
    sums_l = xlp + _linear(p, "lsthm_l_U", h_l) + \
        _linear(p, "lsthm_l_V", z) + _linear(p, "lsthm_l_S", q_affine)
    c_l, h_l = lsthm_gates(sums_l, c_l)
    sums_a = xap + _linear(p, "lsthm_a_U", h_a) + \
        _linear(p, "lsthm_a_V", z) + _linear(p, "lsthm_a_S", q_affine)
    c_a, h_a = lsthm_gates(sums_a, c_a)

    def multi_att(proj, cs, kdim):
        heads = proj.reshape(proj.shape[0], K, kdim)
        return jax.nn.softmax(heads, axis=-1) * cs[:, None, :]

    new_cs = jnp.concatenate([c_l, c_a], axis=1)
    attended = multi_att(_linear(p, "att_0", new_cs), new_cs, D)
    al = jax.nn.relu(_linear(p, "att_l_0", c_l))
    attended_l = multi_att(al, c_l, H)
    aa = jax.nn.relu(_linear(p, "att_a_0", c_a))
    attended_a = multi_att(aa, c_a, H)

    cm_in = jnp.concatenate([attended_l, attended_a], axis=-1)
    cross_modal = jax.nn.relu(_linear(p, "att_cross_modal_0", cm_in))
    z_temp = jnp.concatenate([cross_modal, attended], axis=-1)
    z_flat = z_temp.reshape(z_temp.shape[0], -1)
    z_new = jax.nn.relu(_linear(p, "fc_z_0", z_flat))
    ws = jax.nn.softmax(p["w"])
    z = ws[0] * z_new + ws[1] * z

    y = jnp.concatenate([h_l, h_a, z], axis=-1)
    out = jnp.matmul(y, p["nn_out_0"]["kernel"]) + p["nn_out_0"]["bias"]
    out = jax.nn.relu(out)
    out = jnp.matmul(out, p["nn_out_3"]["kernel"]) + p["nn_out_3"]["bias"]
    return (h_l, c_l, h_a, c_a, z, q), out[0]


@functools.partial(jax.jit, static_argnums=())
def _stream_step(params, state, x_row, q_row):
    """Advance one utterance. state = (t, hist_l, hist_a, carry)."""
    t, hist_l, hist_a, carry = state
    d_l = hist_l.shape[1]
    # same input slicing as the model (marn_newz.py: x[..., :100] text,
    # x[..., 100:200] the next 100 dims — the reference's own quirk); the
    # row may be the full 1124-d trainer layout or a pre-sliced 200-d row.
    row_l, row_a = x_row[:d_l], x_row[d_l:2 * d_l]
    hist_l = hist_l.at[t].set(row_l)
    hist_a = hist_a.at[t].set(row_a)
    enc_l = _encoder_row(params["encoder_l"], hist_l, row_l, t + 1)
    enc_a = _encoder_row(params["encoder_a"], hist_a, row_a, t + 1)
    carry, logits = _cell_step(params, carry, enc_l, enc_a, q_row)
    return (t + 1, hist_l, hist_a, carry), logits


class NewZStream:
    """Streaming session over one dialogue for MARN1_newz.

    ``append(x_row, q_row) -> raw logits [n_classes]`` where ``x_row`` is the
    200-d text|audio feature row and ``q_row`` the P-way speaker one-hot.
    O(1) serial work per utterance; state stays on device.
    """

    def __init__(self, params, n_classes=6, max_len=128, n_parties=2,
                 dh=128):
        self.params = params
        self.max_len = max_len
        self.n_parties = n_parties
        self.dh = dh
        self.d_l = 100
        self.reset()

    def reset(self):
        H, D = self.dh, 2 * self.dh
        z1 = jnp.zeros((1, H), jnp.float32)
        carry = (z1, z1, z1, z1, jnp.zeros((1, D), jnp.float32),
                 jnp.zeros((1, self.n_parties, 4 * H), jnp.float32))
        self.state = (jnp.int32(0),
                      jnp.zeros((self.max_len, self.d_l), jnp.float32),
                      jnp.zeros((self.max_len, self.d_l), jnp.float32),
                      carry)

    def append(self, x_row, q_row):
        if int(self.state[0]) >= self.max_len:
            raise ValueError(f"dialogue exceeds max_len={self.max_len}")
        self.state, logits = _stream_step(
            self.params, self.state,
            jnp.asarray(x_row, jnp.float32), jnp.asarray(q_row, jnp.float32))
        return np.asarray(logits)
