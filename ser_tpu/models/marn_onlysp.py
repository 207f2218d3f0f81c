"""MARN1_onlysp — the reference's default flagship model.

TPU-native rebuild of ``/root/reference/model/lsthm_onlysp.py:132-320``:
a bidirectional dialogue recurrence over per-utterance text/audio features
with a GRU speaker memory, speaker-conditioned LSTHM1 cells per modality, a
per-step rank-1 cross-modal fusion state z, sequence-level cross attention
with learnable scalar fusion weights (w, v, v1, v2), and a 2-layer MLP head
emitting per-utterance log-probabilities.

TPU-first differences from the reference (math-preserving):
- the Python ``for i in range(T)`` loop becomes one ``jax.lax.scan``;
- per-step x projections (LSTHM W, GRU input side) are hoisted out of the
  scan into big [L*B, d] matmuls on the MXU;
- the state-side LSTHM projections U/V/S fuse into a single
  [h|z|s] @ [3H, 4H] matmul per modality per step;
- per-step cross attention uses the collapsed rank-1 form (O(B*D^2) instead
  of O(B*D^3), see ``ser_tpu.ops.attention``);
- the O(T^2) ``torch.cat`` history and the per-row Python speaker gather are
  replaced by scan-stacked outputs and one-hot einsums;
- mask-aware sequence reversal is a single gather (``ser_tpu.ops.masking``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops import init as tinit
from ser_tpu.ops.attention import (
    CrossAttentionReSeq,
    CrossAttentionSeq,
    paired_attention_tail,
    rank1_cross_attention,
)
from ser_tpu.ops.cells import (
    declare_linear,
    declare_rnn_linear,
    gru_step,
    lsthm_gates,
)
from ser_tpu.ops.encoder import EncoderLayer
from ser_tpu.ops.layers import Dropout, TorchLinear, dropout
from ser_tpu.ops.masking import reverse_seq, scatter_parties, select_parties

# Measurement-only switch (scripts/profile_tail_inmodel.py): replaces the
# post-recurrence tail's 4 sequence cross-attentions with zeros so
# full - ablated measures the tail's IN-MODEL cost (the standalone-residual
# estimate in r3 was noise-dominated). Never set in production.
_ABLATE_TAIL = False


class MARNCellOnlySP(nn.Module):
    """One direction of the dialogue recurrence
    (ref ``model/lsthm_onlysp.py:132-206``).

    Speaker memory: a GRUCell on concatenated text+audio features, scattered
    into a per-party buffer q. Per modality: LSTHM1 (4-term gates). Fusion:
    per-step rank-1 cross attention from c_l to c_a.
    """

    dh_l: int = 128
    dh_a: int = 128
    d_l: int = 100
    d_a: int = 100
    dh_s: int = 128
    dropout_rate: float = 0.5
    attn_dropout: float = 0.2
    # Recurrence backend: 'auto'/'off' use lax.scan (measured FASTER than the
    # hand-fused Pallas kernel at IEMOCAP shapes — see ops/pallas/lsthm.py);
    # 'on' forces the fused Pallas kernel (eval only), 'interpret' runs it
    # in CPU-debuggable interpret mode.
    pallas: str = "auto"

    @nn.compact
    def __call__(self, x_l, x_a, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B = x_l.shape[0], x_l.shape[1]
        P = qmask.shape[2]
        Hl, Ha, Hs = self.dh_l, self.dh_a, self.dh_s

        # --- parameters (torch-default init) ---
        Wl, bWl = declare_linear(self, "lsthm_l_W", self.d_l, 4 * Hl)
        Ul, bUl = declare_linear(self, "lsthm_l_U", Hl, 4 * Hl)
        Vl, bVl = declare_linear(self, "lsthm_l_V", Hl, 4 * Hl)
        Sl, bSl = declare_linear(self, "lsthm_l_S", Hs, 4 * Hl)

        Wa, bWa = declare_linear(self, "lsthm_a_W", self.d_a, 4 * Ha)
        Ua, bUa = declare_linear(self, "lsthm_a_U", Ha, 4 * Ha)
        Va, bVa = declare_linear(self, "lsthm_a_V", Hl, 4 * Ha)
        Sa, bSa = declare_linear(self, "lsthm_a_S", Hs, 4 * Ha)

        gWih, gbih = declare_rnn_linear(
            self, "gru_s_ih", self.d_l + self.d_a, 3 * Hs, Hs
        )
        gWhh, gbhh = declare_rnn_linear(self, "gru_s_hh", Hs, 3 * Hs, Hs)

        wq = self.param("crossatt_l2a_Wq", tinit.ones, (Hl,))
        wk = self.param("crossatt_l2a_Wk", tinit.ones, (Hl,))
        # Declared-but-unused in the reference (crossatt Wv; whole a2l module;
        # the lstm_q0/q1/lstm_s LSTMCells at lsthm_onlysp.py:147-155).
        # Materialized for parameter-count parity with the reference report.
        self.param("crossatt_l2a_Wv", tinit.ones, (Hl,))
        self.param("crossatt_a2l_Wq", tinit.ones, (Ha,))
        self.param("crossatt_a2l_Wk", tinit.ones, (Ha,))
        self.param("crossatt_a2l_Wv", tinit.ones, (Ha,))
        declare_rnn_linear(self, "lstm_q0_ih", Hs, 4 * Hs, Hs)
        declare_rnn_linear(self, "lstm_q0_hh", Hs, 4 * Hs, Hs)
        declare_rnn_linear(self, "lstm_q1_ih", Hs, 4 * Hs, Hs)
        declare_rnn_linear(self, "lstm_q1_hh", Hs, 4 * Hs, Hs)
        declare_rnn_linear(self, "lstm_s_ih", Hs, 4 * Hs, Hs)
        declare_rnn_linear(self, "lstm_s_hh", Hs, 4 * Hs, Hs)

        # --- hoisted x-side projections: one MXU matmul over all steps ---
        xl_proj = jnp.matmul(x_l, Wl) + bWl  # [L, B, 4Hl]
        xa_proj = jnp.matmul(x_a, Wa) + bWa  # [L, B, 4Ha]
        gru_x = jnp.matmul(jnp.concatenate([x_l, x_a], axis=-1), gWih) + gbih

        # --- fused state-side kernels: [h|z|s] @ K per modality ---
        K_l = jnp.concatenate([Ul, Vl, Sl], axis=0)  # [Hl+Hl+Hs, 4Hl]
        b_l = bUl + bVl + bSl
        K_a = jnp.concatenate([Ua, Va, Sa], axis=0)  # [Ha+Hl+Hs, 4Ha]
        b_a = bUa + bVa + bSa

        if mode == "gather":
            # Hand the hoisted projections + fused kernels to the caller so
            # both directions can run as ONE scan with a direction-vmapped
            # step (see MARN1OnlySP eval path).
            seqs = (xl_proj, xa_proj, gru_x, qmask)
            consts = (K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk)
            return seqs, consts

        training = not deterministic

        # Fused Pallas recurrence fast path (eval only: dropout-free).
        use_pallas = (
            not training
            and P == 2
            and Hl == Ha == Hs
            and self.pallas in ("on", "interpret")
        )
        if use_pallas:
            from ser_tpu.ops.pallas.lsthm import lsthm_onlysp_recurrence

            return lsthm_onlysp_recurrence(
                xl_proj, xa_proj, gru_x, qmask,
                K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk,
                interpret=(self.pallas == "interpret"),
            )

        if training:
            keys = jax.random.split(self.make_rng("dropout"), L)
        else:
            keys = jnp.zeros((L, 1), jnp.float32)  # placeholder xs

        def step(carry, xs):
            h_l, c_l, h_a, c_a, z, q = carry
            xlp, xap, gxp, qm, key = xs
            if training:
                k_s, k_l, k_a, k_z = jax.random.split(key, 4)
            else:
                k_s = k_l = k_a = k_z = None

            qs0 = select_parties(q, qm)  # previous speaker state
            h_s = gru_step(gxp, qs0, gWhh, gbhh)
            h_s = dropout(h_s, self.dropout_rate, deterministic, k_s)
            q = scatter_parties(q, qm, h_s)

            sums_l = xlp + jnp.matmul(
                jnp.concatenate([h_l, z, h_s], axis=-1), K_l
            ) + b_l
            c_l, h_l = lsthm_gates(sums_l, c_l)
            h_l = dropout(h_l, self.dropout_rate, deterministic, k_l)

            sums_a = xap + jnp.matmul(
                jnp.concatenate([h_a, z, h_s], axis=-1), K_a
            ) + b_a
            c_a, h_a = lsthm_gates(sums_a, c_a)
            h_a = dropout(h_a, self.dropout_rate, deterministic, k_a)

            z = rank1_cross_attention(
                c_l, c_a, wq, wk, self.attn_dropout, deterministic, k_z
            )
            y = jnp.concatenate([h_l, h_a, z, h_s], axis=-1)
            return (h_l, c_l, h_a, c_a, z, q), y

        init_carry = (
            jnp.zeros((B, Hl), x_l.dtype),
            jnp.zeros((B, Hl), x_l.dtype),
            jnp.zeros((B, Ha), x_l.dtype),
            jnp.zeros((B, Ha), x_l.dtype),
            jnp.zeros((B, Hl), x_l.dtype),
            jnp.zeros((B, P, Hs), x_l.dtype),
        )
        if training:
            # Rematerialize per the configured policy (see config.SCAN_REMAT):
            # bounds residual memory below the [B, H, H] attention
            # intermediates (~6 GB per direction at IEMOCAP train shapes)
            # while keeping matmul outputs saved.
            from ser_tpu import config

            step = config.scan_remat(step)
        _, h = jax.lax.scan(step, init_carry, (xl_proj, xa_proj, gru_x, qmask, keys))
        return h  # [L, B, Hl+Ha+Hl+Hs]


def _eval_step(consts, carry, xs):
    """Dropout-free onlysp recurrence step (pure; vmappable over the
    direction axis so forward+backward run as one scan at eval)."""
    K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk = consts
    h_l, c_l, h_a, c_a, z, q = carry
    xlp, xap, gxp, qm = xs

    qs0 = select_parties(q, qm)
    h_s = gru_step(gxp, qs0, gWhh, gbhh)
    q = scatter_parties(q, qm, h_s)

    sums_l = xlp + jnp.matmul(
        jnp.concatenate([h_l, z, h_s], axis=-1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    sums_a = xap + jnp.matmul(
        jnp.concatenate([h_a, z, h_s], axis=-1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)

    z = rank1_cross_attention(c_l, c_a, wq, wk, 0.0, True, None)
    y = jnp.concatenate([h_l, h_a, z, h_s], axis=-1)
    return (h_l, c_l, h_a, c_a, z, q), y


def _onlysp_step(consts, carry, xs, dropout_rate=0.5, attn_dropout=0.2,
                 training=False):
    """Dispatch for the fused-directions scaffolding: the train step's xs
    carries a per-direction dropout key appended by _fused_directions."""
    if training:
        return _train_step_dir(consts, carry, xs, dropout_rate, attn_dropout)
    return _eval_step(consts, carry, xs)


def _train_step_dir(consts, carry, xs, dropout_rate=0.5, attn_dropout=0.2):
    """Training-mode onlysp step with per-direction dropout keys
    (vmappable over the direction axis like _eval_step)."""
    K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk = consts
    h_l, c_l, h_a, c_a, z, q = carry
    xlp, xap, gxp, qm, key = xs
    k_s, k_l, k_a, k_z = jax.random.split(key, 4)

    qs0 = select_parties(q, qm)
    h_s = gru_step(gxp, qs0, gWhh, gbhh)
    h_s = dropout(h_s, dropout_rate, False, k_s)
    q = scatter_parties(q, qm, h_s)

    sums_l = xlp + jnp.matmul(
        jnp.concatenate([h_l, z, h_s], axis=-1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    h_l = dropout(h_l, dropout_rate, False, k_l)
    sums_a = xap + jnp.matmul(
        jnp.concatenate([h_a, z, h_s], axis=-1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)
    h_a = dropout(h_a, dropout_rate, False, k_a)

    z = rank1_cross_attention(c_l, c_a, wq, wk, attn_dropout, False, k_z)
    y = jnp.concatenate([h_l, h_a, z, h_s], axis=-1)
    return (h_l, c_l, h_a, c_a, z, q), y


class MARN1OnlySP(nn.Module):
    """Top-level MARN1_onlysp (ref ``model/lsthm_onlysp.py:210-320``).

    Input x is time-major [L, B, 1124] = RoBERTa-1024 text | audio-100.
    Returns (log_probs [B*L, n_classes], x_l, x_a) with x_l/x_a the
    post-encoder time-major features, matching the reference surface.
    """

    n_classes: int = 6
    d_r: int = 1024
    d_l: int = 100
    d_a: int = 100
    # Eval-time fusion: run the forward and backward recurrences as ONE scan
    # with a direction-vmapped step (halves the number of sequential steps;
    # identical math — the directions are independent until the concat).
    fuse_eval_directions: bool = True

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_r], 0, 1)  # [B, L, 1024]
        x_a = jnp.swapaxes(x[:, :, self.d_r : self.d_r + self.d_a], 0, 1)

        x_l = TorchLinear(self.d_l, name="linear_in")(x_l)

        encoder_l = EncoderLayer(100, 40, 8, 40, 40, name="encoder_l")
        encoder_a = EncoderLayer(100, 40, 8, 40, 40, name="encoder_a")
        # The reference applies the SAME encoder layer twice (shared weights,
        # ``lsthm_onlysp.py:264-268``).
        x_l, _ = encoder_l(x_l, deterministic=deterministic)
        x_a, _ = encoder_a(x_a, deterministic=deterministic)
        x_l, _ = encoder_l(x_l, deterministic=deterministic)
        x_a, _ = encoder_a(x_a, deterministic=deterministic)

        x_l = jnp.swapaxes(x_l, 0, 1)  # [L, B, 100]
        x_a = jnp.swapaxes(x_a, 0, 1)

        cell_f = MARNCellOnlySP(name="marn_cell_f")
        cell_b = MARNCellOnlySP(name="marn_cell_b")
        rev_x_l = reverse_seq(x_l, umask)
        rev_x_a = reverse_seq(x_a, umask)
        rev_qmask = reverse_seq(qmask, umask)

        from ser_tpu import config

        B, P = x_l.shape[1], qmask.shape[2]
        Hl, Ha, Hs = cell_f.dh_l, cell_f.dh_a, cell_f.dh_s
        use_stacked = (deterministic and config.onlysp_stacked(
            B, P, Hl == Ha == Hs == 128))
        if use_stacked:
            # Eval fast path: the ENTIRE bidirectional recurrence as ONE
            # Pallas call with both directions stacked on the row axis and
            # VMEM-resident carries (ops/pallas/lsthm.py; gated by
            # config.ONLYSP_STACKED — same math as the fused scan below,
            # kernel-vs-scan parity pinned in tests/test_pallas_lsthm.py).
            from ser_tpu.ops.pallas.lsthm import (
                lsthm_onlysp_recurrence_bidir_stacked)

            seqs_f, consts_f = cell_f(x_l, x_a, qmask, True, mode="gather")
            seqs_b, consts_b = cell_b(
                rev_x_l, rev_x_a, rev_qmask, True, mode="gather")
            seqs = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b], axis=1), seqs_f, seqs_b)
            consts = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), consts_f, consts_b)
            ys = lsthm_onlysp_recurrence_bidir_stacked(
                seqs, consts,
                interpret=(config.ONLYSP_STACKED == "interpret"))
            h_f, h_b = ys[:, 0], ys[:, 1]
        elif self.fuse_eval_directions:
            # Both directions in one scan: stack per-step inputs on a
            # direction axis and vmap the step over it. (At train time the
            # per-direction dropout keys ride along as scan inputs; the RNG
            # stream differs from the unfused path but is distributionally
            # identical.) Scaffolding shared with the whole MARN1 family:
            # marn_variants._fused_directions.
            import functools

            from ser_tpu.models.marn_variants import _fused_directions

            zb = lambda *s: jnp.zeros(s, x_l.dtype)
            init = (zb(B, Hl), zb(B, Hl), zb(B, Ha), zb(B, Ha),
                    zb(B, Hl), zb(B, P, Hs))  # z = attention over c_l rows

            h_f, h_b = _fused_directions(
                cell_f, cell_b,
                (x_l, x_a, qmask), (rev_x_l, rev_x_a, rev_qmask),
                functools.partial(
                    _onlysp_step, dropout_rate=cell_f.dropout_rate,
                    attn_dropout=cell_f.attn_dropout),
                n_state=5, deterministic=deterministic,
                make_rng=lambda: self.make_rng("dropout"), init=init)
        else:
            h_f = cell_f(x_l, x_a, qmask, deterministic)
            h_b = cell_b(rev_x_l, rev_x_a, rev_qmask, deterministic)

        h_f = Dropout(0.5, name="dropout_rec")(h_f, deterministic)
        h_b = reverse_seq(h_b, umask)
        h_b = Dropout(0.5, name="dropout_rec_b")(h_b, deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)

        # Sequence-level cross attention with learnable scalar fusion weights
        # (ones-init, ref ``lsthm_onlysp.py:250-256,287-293``).
        w = self.param("w", tinit.ones, (1,))
        v = self.param("v", tinit.ones, (1,))
        v1 = self.param("v1", tinit.ones, (1,))
        v2 = self.param("v2", tinit.ones, (1,))

        seq_mods = (CrossAttentionSeq(name="crossatt_l2a"),
                    CrossAttentionSeq(name="crossatt_a2l"))
        reseq_mods = (CrossAttentionReSeq(name="crossatt_l2a_1"),
                      CrossAttentionReSeq(name="crossatt_a2l_1"))
        if _ABLATE_TAIL:
            # measurement-only (scripts/profile_tail_inmodel.py): zero the
            # 4 seq cross-attentions so full - ablated bounds the tail's
            # IN-MODEL cost. Never set in production; init with it False.
            attn1 = jnp.zeros(h.shape[:2] + (128,), h.dtype)
            attn2 = attn1
        elif config.tail_paired():
            # Pair-batched tail: both chains of each stage as ONE batched
            # einsum set (identical math; ops/attention.py).
            rngs = ((None, None) if deterministic else
                    tuple(jax.random.split(self.make_rng("dropout"))))
            attn1, attn2 = paired_attention_tail(
                seq_mods, reseq_mods, w * x_l, v * x_a, v1, v2,
                deterministic, rngs)
        else:
            attn1 = seq_mods[0](w * x_l, v * x_a, deterministic)
            attn2 = seq_mods[1](v * x_a, w * x_l, deterministic)
            attn1 = reseq_mods[0](v * x_a, v1 * attn1, deterministic)
            attn2 = reseq_mods[1](w * x_l, v2 * attn2, deterministic)

        feats = jnp.concatenate([h, attn1, attn2], axis=-1)  # [L, B, 1280]
        out = TorchLinear(32, name="nn_out_0")(feats)
        out = nn.relu(out)
        out = Dropout(0.5, name="nn_out_drop")(out, deterministic)
        out = TorchLinear(self.n_classes, name="nn_out_3")(out)
        # Unused ``self.linear`` in the reference (lsthm_onlysp.py:229) —
        # declared for parameter-count parity.
        _ = TorchLinear(32, name="linear")(jnp.zeros((1, feats.shape[-1])))

        logp = jax.nn.log_softmax(out, axis=2)  # [L, B, C]
        logp = jnp.swapaxes(logp, 0, 1).reshape(-1, self.n_classes)  # [B*L, C]
        return logp, x_l, x_a
