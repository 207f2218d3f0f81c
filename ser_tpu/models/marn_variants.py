"""The MARN1_* variant zoo — sp, sps, nsps, no_en, cf, mf, la, azs.

TPU-native rebuilds of the reference ablation family (one file per variant in
``/root/reference/model/lsthm_*.py``; see SURVEY.md §2.2 for the feature
matrix). Each variant keeps its reference quirks bit-for-bit in the math —
including declared-but-unused parameters (materialized for parameter-count
parity), the sp/cf/mf/la/azs ``q_0``-broadcast speaker scatter (both party
slots rewritten, unlike onlysp's masked scatter), la's aux-gate bug (both
gate LSTMs read x_l), and sps's per-party compaction (see MARNCellSPS).

All recurrences are ``jax.lax.scan``; hoistable x-side projections run as one
MXU matmul over all timesteps; state-side LSTHM projections fuse into a
single concat-matmul per step.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops import init as tinit
from ser_tpu.ops.attention import (
    CrossAttentionReSeq,
    CrossAttentionSeq,
    CrossAttentionSeqLN,
    rank1_cross_attention,
)
from ser_tpu.ops.cells import (
    declare_linear,
    declare_rnn_linear,
    gru_step,
    lsthm_gates,
    lsthm_mf_gates,
    lstm_step,
)
from ser_tpu.ops.encoder import EncoderLayer
from ser_tpu.ops.layers import Dropout, TorchLinear, dropout
from ser_tpu.ops.masking import reverse_seq, select_parties


def _argmax_onehot(qmask_t):
    """torch.argmax-derived one-hot (all-zero rows -> party 0)."""
    idx = jnp.argmax(qmask_t, axis=1)
    return jax.nn.one_hot(idx, qmask_t.shape[1], dtype=qmask_t.dtype)


def _broadcast_scatter(sel, new, qmask_t):
    """sp/cf/mf/la/azs-style q update (ref ``lsthm_sp.py:145-148``):
    ``q = sel_bcast * (1 - qmask) + new_bcast * qmask`` — note the NON-speaker
    slot is overwritten with the *selected speaker's previous* memory."""
    m = qmask_t[:, :, None]
    return sel[:, None, :] * (1.0 - m) + new[:, None, :] * m


def _dropout_keys(module, deterministic, L, n):
    if deterministic:
        return jnp.zeros((L, n), jnp.float32)
    return jax.random.split(module.make_rng("dropout"), (L, n))


def _logp_head(module, feats, n_classes, h_out=32, out_dropout=0.5,
               deterministic=True, name="nn_out"):
    """Linear -> ReLU -> Dropout -> Linear -> log_softmax -> [B*L, C]."""
    out = TorchLinear(h_out, name=f"{name}_0")(feats)
    out = nn.relu(out)
    out = Dropout(out_dropout, name=f"{name}_drop")(out, deterministic)
    out = TorchLinear(n_classes, name=f"{name}_3")(out)
    logp = jax.nn.log_softmax(out, axis=2)
    return jnp.swapaxes(logp, 0, 1).reshape(-1, n_classes)


# =========================================================================
# MARN1_sp (ref model/lsthm_sp.py:103-310)
# =========================================================================

class MARNCellSP(nn.Module):
    """Speaker memory via a 3-term LSTHM1 on the selected party state."""

    dh: int = 128
    d_in: int = 100
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x_l, x_a, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        H = self.dh

        Wl, bWl = declare_linear(self, "lsthm_l_W", self.d_in, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", self.d_in, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", H, 4 * H)
        Wq, bWq = declare_linear(self, "lsthm_q_W", H, 4 * H)
        Uq, bUq = declare_linear(self, "lsthm_q_U", H, 4 * H)
        Vq, bVq = declare_linear(self, "lsthm_q_V", H, 4 * H)
        # Unused-in-forward S projections + lstm_s + a2l attention (parity
        # with lsthm_sp.py:18,31,117: S is declared, never applied).
        declare_linear(self, "lsthm_l_S", H, 4 * H)
        declare_linear(self, "lsthm_a_S", H, 4 * H)
        declare_linear(self, "lsthm_q_S", H, 4 * H)
        declare_rnn_linear(self, "lstm_s_ih", H, 4 * H, H)
        declare_rnn_linear(self, "lstm_s_hh", H, 4 * H, H)
        wq = self.param("crossatt_l2a_Wq", tinit.ones, (H,))
        wk = self.param("crossatt_l2a_Wk", tinit.ones, (H,))
        self.param("crossatt_l2a_Wv", tinit.ones, (H,))
        self.param("crossatt_a2l_Wq", tinit.ones, (H,))
        self.param("crossatt_a2l_Wk", tinit.ones, (H,))
        self.param("crossatt_a2l_Wv", tinit.ones, (H,))

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa
        K_l = jnp.concatenate([Ul, Vl], axis=0)
        b_l = bUl + bVl
        K_a = jnp.concatenate([Ua, Va], axis=0)
        b_a = bUa + bVa
        K_q = jnp.concatenate([Wq, Uq, Vq], axis=0)
        b_q = bWq + bUq + bVq

        if mode == "gather":
            from ser_tpu import config

            if config.stack_modalities("sp"):
                # sp's q/l/a LSTHM chains are ALL mutually independent
                # within a step (each reads only carried state), so all
                # three ride one modality axis. Per-modality state layout
                # [own_h, z, extra] with extra = q0_sel for q and an
                # exact-zero slab (zero state x zero kernel rows) for l/a.
                zH = jnp.zeros((H, 4 * H), K_q.dtype)
                K = jnp.stack([
                    jnp.concatenate([Uq, Vq, Wq], axis=0),   # [h_q, z, q0]
                    jnp.concatenate([Ul, Vl, zH], axis=0),   # [h_l, z, 0]
                    jnp.concatenate([Ua, Va, zH], axis=0),   # [h_a, z, 0]
                ])                                            # [3, 3H, 4H]
                b = jnp.stack([b_q, b_l, b_a])[:, None, :]    # [3, 1, 4H]
                xp = jnp.stack(
                    [jnp.zeros_like(xl_proj), xl_proj, xa_proj], axis=1)
                return ((xp, qmask), (K, b, wq, wk))
            return ((xl_proj, xa_proj, qmask),
                    (K_l, b_l, K_a, b_a, K_q, b_q, wq, wk))

        keys = _dropout_keys(self, deterministic, L, 4)

        def step(carry, xs):
            h_l, c_l, h_a, c_a, h_q, c_q, z, q = carry
            xlp, xap, qm, key = xs
            ks = None if deterministic else key

            q0_sel = select_parties(q, qm)
            sums_q = jnp.matmul(
                jnp.concatenate([q0_sel, h_q, z], axis=-1), K_q
            ) + b_q
            c_q, h_q = lsthm_gates(sums_q, c_q)
            h_q = dropout(h_q, self.dropout_rate, deterministic,
                          None if deterministic else ks[0])
            q = _broadcast_scatter(q0_sel, h_q, qm)

            sums_l = xlp + jnp.matmul(
                jnp.concatenate([h_l, z], axis=-1), K_l
            ) + b_l
            c_l, h_l = lsthm_gates(sums_l, c_l)
            h_l = dropout(h_l, self.dropout_rate, deterministic,
                          None if deterministic else ks[1])
            sums_a = xap + jnp.matmul(
                jnp.concatenate([h_a, z], axis=-1), K_a
            ) + b_a
            c_a, h_a = lsthm_gates(sums_a, c_a)
            h_a = dropout(h_a, self.dropout_rate, deterministic,
                          None if deterministic else ks[2])

            z = rank1_cross_attention(
                c_l, c_a, wq, wk, 0.2, deterministic,
                None if deterministic else ks[3],
            )
            y = jnp.concatenate([h_l, h_a, z, h_q], axis=-1)
            return (h_l, c_l, h_a, c_a, h_q, c_q, z, q), y

        z0 = jnp.zeros((B, H), x_l.dtype)
        init = (z0, z0, z0, z0, z0, z0, z0, jnp.zeros((B, P, H), x_l.dtype))
        _, h = jax.lax.scan(step, init, (xl_proj, xa_proj, qmask, keys))
        return h


class MARN1SP(nn.Module):
    """MARN1_sp top level (ref ``lsthm_sp.py:226-310``)."""

    n_classes: int = 6
    d_l: int = 100
    d_a: int = 100

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_l : self.d_l + self.d_a], 0, 1)
        x_l, _ = EncoderLayer(100, 40, 8, 40, 40, name="encoder_l")(
            x_l, deterministic=deterministic)
        x_a, _ = EncoderLayer(100, 40, 8, 40, 40, name="encoder_a")(
            x_a, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        import functools

        rev_x_l = reverse_seq(x_l, umask)
        rev_x_a = reverse_seq(x_a, umask)
        rev_qmask = reverse_seq(qmask, umask)
        from ser_tpu import config

        cell_f = MARNCellSP(name="marn_cell_f")
        if config.stack_modalities("sp"):
            def sp_init(consts_f, B, P):
                H = consts_f[0].shape[-1] // 4
                zb = lambda *s: jnp.zeros(s, x_l.dtype)
                return (zb(3, B, H), zb(3, B, H), zb(B, H), zb(B, P, H))

            step_fn = functools.partial(
                _sp_step_stacked, dropout_rate=cell_f.dropout_rate)
            h_f, h_b = _fused_directions(
                cell_f, MARNCellSP(name="marn_cell_b"),
                (x_l, x_a, qmask), (rev_x_l, rev_x_a, rev_qmask),
                step_fn, n_state=0, deterministic=deterministic,
                make_rng=lambda: self.make_rng("dropout"), init=sp_init)
        else:
            h_f, h_b = _fused_directions(
                cell_f, MARNCellSP(name="marn_cell_b"),
                (x_l, x_a, qmask), (rev_x_l, rev_x_a, rev_qmask),
                functools.partial(_sp_step, dropout_rate=cell_f.dropout_rate),
                n_state=7, deterministic=deterministic,
                make_rng=lambda: self.make_rng("dropout"))
        h_f = Dropout(0.5, name="dropout_rec")(h_f, deterministic)
        h_b = reverse_seq(h_b, umask)
        h_b = Dropout(0.5, name="dropout_rec_b")(h_b, deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)

        attn1 = CrossAttentionSeq(name="crossatt_l2a")(x_l, x_a, deterministic)
        attn2 = CrossAttentionSeq(name="crossatt_a2l")(x_a, x_l, deterministic)

        feats = jnp.concatenate([h, attn1, attn2], axis=-1)
        _ = TorchLinear(32, name="linear")(jnp.zeros((1, feats.shape[-1])))
        logp = _logp_head(self, feats, self.n_classes,
                          deterministic=deterministic)
        return logp, x_l, x_a


def _sp_step(consts, carry, xs, dropout_rate, training):
    """Pure sp recurrence step (vmappable over the direction axis)."""
    K_l, b_l, K_a, b_a, K_q, b_q, wq, wk = consts
    h_l, c_l, h_a, c_a, h_q, c_q, z, q = carry
    if training:
        xlp, xap, qm, key = xs
        ks = jax.random.split(key, 4)
        det = False
    else:
        xlp, xap, qm = xs
        ks = [None] * 4
        det = True

    q0_sel = select_parties(q, qm)
    sums_q = jnp.matmul(jnp.concatenate([q0_sel, h_q, z], -1), K_q) + b_q
    c_q, h_q = lsthm_gates(sums_q, c_q)
    h_q = dropout(h_q, dropout_rate, det, ks[0])
    q = _broadcast_scatter(q0_sel, h_q, qm)

    sums_l = xlp + jnp.matmul(jnp.concatenate([h_l, z], -1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    h_l = dropout(h_l, dropout_rate, det, ks[1])
    sums_a = xap + jnp.matmul(jnp.concatenate([h_a, z], -1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)
    h_a = dropout(h_a, dropout_rate, det, ks[2])

    z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, det, ks[3])
    y = jnp.concatenate([h_l, h_a, z, h_q], axis=-1)
    return (h_l, c_l, h_a, c_a, h_q, c_q, z, q), y


def _sp_step_stacked(consts, carry, xs, dropout_rate, training):
    """Modality-stacked sp step (config.STACK_MODALITIES): the q, l and a
    LSTHM chains each read only carried state, so all three concat->matmul->
    gates->dropout chains ride one leading modality axis — ONE batched
    einsum + ONE gate pass + ONE dropout draw per step instead of three
    serial op groups. Same math as ``_sp_step`` (the l/a state pad slab is
    exact-zero x zero kernel rows); the h-dropout mask is drawn once over
    [3, B, H] — the distributional-RNG contract of the fused scan."""
    K, b, wq, wk = consts
    h_qla, c_qla, z, q = carry  # h_qla/c_qla: [3, B, H]
    if training:
        xp, qm, key = xs
        ks = jax.random.split(key, 2)
        det = False
    else:
        xp, qm = xs
        ks = [None, None]
        det = True

    q0_sel = select_parties(q, qm)
    z_b = jnp.broadcast_to(z[None], h_qla.shape)
    q0_pad = jnp.concatenate(
        [q0_sel[None], jnp.zeros_like(h_qla[:2])], axis=0)
    state = jnp.concatenate([h_qla, z_b, q0_pad], axis=-1)  # [3, B, 3H]
    sums = xp + jnp.einsum("mbi,mio->mbo", state, K) + b
    c_qla, h_qla = lsthm_gates(sums, c_qla)
    h_qla = dropout(h_qla, dropout_rate, det, ks[0])
    q = _broadcast_scatter(q0_sel, h_qla[0], qm)

    z = rank1_cross_attention(c_qla[1], c_qla[2], wq, wk, 0.2, det, ks[1])
    y = jnp.concatenate([h_qla[1], h_qla[2], z, h_qla[0]], axis=-1)
    return (h_qla, c_qla, z, q), y


def _fused_directions(cell_f, cell_b, inputs_f, inputs_b, step_fn,
                      n_state, deterministic, make_rng=None, qmask_idx=2,
                      init=None, thread_keys=True, train_unroll=1):
    """Generic fwd+bwd fusion: gather both cells, stack on a direction axis,
    run one scan with the step vmapped over it. Returns (ys_f, ys_b).

    ``init`` overrides the default carry (n_state [B, H] zeros + one
    [B, P, H] buffer), given as the PER-DIRECTION pytree (stacked here),
    or as a callable ``init(consts_f, B, P) -> pytree`` when the carry
    dims must be read off the gathered constants (la's d_l states).
    ``thread_keys=False`` is for dropout-free step fns (mf/la): no
    ``training=`` partial and no per-step key appended to the scan xs.
    ``train_unroll``: lax.scan unroll factor applied in TRAIN mode only
    (config.scan_unroll — amortizes per-step weight streaming where the
    r5 diagnosis measured a win; eval stays unroll=1)."""
    import functools

    seqs_f, consts_f = cell_f(*inputs_f, deterministic, mode="gather")
    seqs_b, consts_b = cell_b(*inputs_b, deterministic, mode="gather")
    seqs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b], axis=1), seqs_f, seqs_b)
    consts = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), consts_f, consts_b)

    L = inputs_f[0].shape[0]
    B = inputs_f[0].shape[1]
    P = inputs_f[qmask_idx].shape[2]
    z2 = lambda *s: jnp.zeros((2,) + s, inputs_f[0].dtype)
    if init is None:
        H = consts_f[0].shape[1] // 4
        init = tuple(z2(B, H) for _ in range(n_state)) + (z2(B, P, H),)
    else:
        if callable(init):
            init = init(consts_f, B, P)
        init = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), init)

    training = not deterministic
    fn = (functools.partial(step_fn, training=training) if thread_keys
          else step_fn)
    if training and thread_keys:
        keys = jax.random.split(make_rng(), (L, 2))
        if isinstance(seqs, dict):
            seqs = {**seqs, "key": keys}
        else:
            seqs = seqs + (keys,)

    def step(carry, xs):
        return jax.vmap(fn, in_axes=(0, 0, 0))(consts, carry, xs)

    unroll = 1
    if training:
        from ser_tpu import config

        step = config.scan_remat(step)
        unroll = train_unroll
    _, ys = jax.lax.scan(step, init, seqs, unroll=unroll)
    if isinstance(ys, tuple):
        return tuple((y[:, 0], y[:, 1]) for y in ys)
    return ys[:, 0], ys[:, 1]


# =========================================================================
# MARN1_cf / MARN1_azs (shared-LSTMCell speaker memory, no in-cell dropout)
# (ref model/lsthm_cf.py:103-290, model/lsthm_azs.py:74-218)
# =========================================================================

class MARNCellSharedLSTM(nn.Module):
    """cf/azs recurrence: cal_q via one shared LSTMCell; LSTHM gates are
    3-term for cf (S declared, unused) and 4-term for azs."""

    use_speaker_term: bool  # azs True, cf False
    emit_q: bool  # cf True (q_affine in per-step output), azs False (z only)
    dh: int = 128
    d_in: int = 100

    @nn.compact
    def __call__(self, x_l, x_a, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        H = self.dh

        Wl, bWl = declare_linear(self, "lsthm_l_W", self.d_in, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", self.d_in, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", H, 4 * H)
        Sl, bSl = declare_linear(self, "lsthm_l_S", H, 4 * H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", H, 4 * H)
        sWih, sbih = declare_rnn_linear(self, "lstm_s_ih", H, 4 * H, H)
        sWhh, sbhh = declare_rnn_linear(self, "lstm_s_hh", H, 4 * H, H)
        wq = self.param("crossatt_l2a_Wq", tinit.ones, (H,))
        wk = self.param("crossatt_l2a_Wk", tinit.ones, (H,))
        self.param("crossatt_l2a_Wv", tinit.ones, (H,))
        self.param("crossatt_a2l_Wq", tinit.ones, (H,))
        self.param("crossatt_a2l_Wk", tinit.ones, (H,))
        self.param("crossatt_a2l_Wv", tinit.ones, (H,))

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa
        if self.use_speaker_term:
            K_l = jnp.concatenate([Ul, Vl, Sl], axis=0)
            b_l = bUl + bVl + bSl
            K_a = jnp.concatenate([Ua, Va, Sa], axis=0)
            b_a = bUa + bVa + bSa
        else:
            K_l = jnp.concatenate([Ul, Vl], axis=0)
            b_l = bUl + bVl
            K_a = jnp.concatenate([Ua, Va], axis=0)
            b_a = bUa + bVa

        if mode == "gather":
            # expose hoisted projections + kernels so the caller can run
            # both directions as one direction-vmapped scan (the only in-cell
            # stochasticity is the CrossAttention dropout, whose keys the
            # caller threads as scan inputs in train mode).
            from ser_tpu import config

            if config.stack_modalities("cf"):
                # l/a ride a leading modality axis: per step ONE batched
                # einsum + ONE gate pass instead of two serial chains
                # (config.STACK_MODALITIES).
                xp = jnp.stack([xl_proj, xa_proj], axis=1)  # [L, 2, B, 4H]
                K = jnp.stack([K_l, K_a])                   # [2, in, 4H]
                b = jnp.stack([b_l, b_a])[:, None, :]       # [2, 1, 4H]
                return ((xp, qmask),
                        (K, b, sWih, sbih, sWhh, sbhh, wq, wk))
            return ((xl_proj, xa_proj, qmask),
                    (K_l, b_l, K_a, b_a, sWih, sbih, sWhh, sbhh, wq, wk))

        keys = _dropout_keys(self, deterministic, L, 1)

        def step(carry, xs):
            h_l, c_l, h_a, c_a, h_s, c_s, z, q = carry
            xlp, xap, qm, key = xs

            q0_sel = select_parties(q, qm)
            xs_proj = jnp.matmul(q0_sel, sWih) + sbih
            h_s, c_s = lstm_step(xs_proj, h_s, c_s, sWhh, sbhh)
            q_affine = h_s
            q = _broadcast_scatter(q0_sel, q_affine, qm)

            if self.use_speaker_term:
                state_l = jnp.concatenate([h_l, z, q_affine], axis=-1)
                state_a = jnp.concatenate([h_a, z, q_affine], axis=-1)
            else:
                state_l = jnp.concatenate([h_l, z], axis=-1)
                state_a = jnp.concatenate([h_a, z], axis=-1)
            c_l, h_l = lsthm_gates(xlp + jnp.matmul(state_l, K_l) + b_l, c_l)
            c_a, h_a = lsthm_gates(xap + jnp.matmul(state_a, K_a) + b_a, c_a)

            z = rank1_cross_attention(
                c_l, c_a, wq, wk, 0.2, deterministic,
                None if deterministic else key[0])
            if self.emit_q:
                y = jnp.concatenate([h_l, h_a, z, q_affine], axis=-1)
            else:
                y = jnp.concatenate([h_l, h_a, z], axis=-1)
            return (h_l, c_l, h_a, c_a, h_s, c_s, z, q), y

        z0 = jnp.zeros((B, H), x_l.dtype)
        init = (z0, z0, z0, z0, z0, z0, z0, jnp.zeros((B, P, H), x_l.dtype))
        _, h = jax.lax.scan(step, init, (xl_proj, xa_proj, qmask, keys))
        return h


class MARN1CF(nn.Module):
    """MARN1_cf (ref ``lsthm_cf.py:206-290``): 3-term LSTHM, q_affine in the
    output, one-way sequence attention in the head. The per-step
    CrossAttention's p=0.2 dropout (``lsthm_cf.py:57-71``) is active in train
    mode, with keys threaded per direction through the fused scan."""

    n_classes: int = 6
    d_l: int = 100
    d_a: int = 100

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_l : self.d_l + self.d_a], 0, 1)
        x_l, _ = EncoderLayer(100, 40, 8, 40, 40, name="encoder_l")(
            x_l, deterministic=deterministic)
        x_a, _ = EncoderLayer(100, 40, 8, 40, 40, name="encoder_a")(
            x_a, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        cell_f = MARNCellSharedLSTM(False, True, name="marn_cell_f")
        cell_b = MARNCellSharedLSTM(False, True, name="marn_cell_b")
        h_f, h_b = _fused_shared_lstm(
            cell_f, cell_b,
            (x_l, x_a, qmask),
            (reverse_seq(x_l, umask), reverse_seq(x_a, umask),
             reverse_seq(qmask, umask)),
            use_speaker_term=False, emit_q=True, deterministic=deterministic,
            make_rng=lambda: self.make_rng("dropout"))
        h_f = Dropout(0.5, name="dropout_rec")(h_f, deterministic)
        h_b = Dropout(0.5, name="dropout_rec_b")(
            reverse_seq(h_b, umask), deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)

        attn1 = CrossAttentionSeq(name="crossatt_l2a")(x_l, x_a, deterministic)
        # crossatt_a2l declared, unused (lsthm_cf.py:242,269)
        _ = CrossAttentionSeq(name="crossatt_a2l")(
            jax.lax.stop_gradient(x_a[:1]), jax.lax.stop_gradient(x_l[:1]),
            True)

        feats = jnp.concatenate([h, attn1], axis=-1)
        _ = TorchLinear(32, name="linear")(jnp.zeros((1, feats.shape[-1])))
        logp = _logp_head(self, feats, self.n_classes,
                          deterministic=deterministic)
        return logp, x_l, x_a


class MARN1AZS(nn.Module):
    """MARN1_azs (ref ``lsthm_azs.py:155-218``): encoders inside the cell,
    4-term LSTHM, no head attention."""

    n_classes: int = 6
    d_l: int = 100
    d_a: int = 100

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        def encode(name, xx):
            x_l = jnp.swapaxes(xx[:, :, : self.d_l], 0, 1)
            x_a = jnp.swapaxes(
                xx[:, :, self.d_l : self.d_l + self.d_a], 0, 1)
            x_l, _ = EncoderLayer(100, 50, 8, 40, 40,
                                  name=f"{name}_encoder_l")(
                x_l, deterministic=deterministic)
            x_a, _ = EncoderLayer(100, 50, 8, 40, 40,
                                  name=f"{name}_encoder_a")(
                x_a, deterministic=deterministic)
            return jnp.swapaxes(x_l, 0, 1), jnp.swapaxes(x_a, 0, 1)

        rev_x = reverse_seq(x, umask)
        rev_qmask = reverse_seq(qmask, umask)
        xf_l, xf_a = encode("marn_cell_f", x)
        xb_l, xb_a = encode("marn_cell_b", rev_x)
        h_f, h_b = _fused_shared_lstm(
            MARNCellSharedLSTM(True, False, name="marn_cell_f"),
            MARNCellSharedLSTM(True, False, name="marn_cell_b"),
            (xf_l, xf_a, qmask), (xb_l, xb_a, rev_qmask),
            use_speaker_term=True, emit_q=False, deterministic=deterministic,
            make_rng=lambda: self.make_rng("dropout"))
        h_f = Dropout(0.5, name="dropout_rec")(h_f, deterministic)
        h_b = Dropout(0.5, name="dropout_rec_b")(
            reverse_seq(h_b, umask), deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)
        _ = TorchLinear(32, name="linear")(jnp.zeros((1, h.shape[-1])))
        logp = _logp_head(self, h, self.n_classes, deterministic=deterministic)
        return (logp,)


def _shared_lstm_step(consts, carry, xs, use_speaker_term, training=False):
    """Pure cf/azs recurrence step (vmappable over the direction axis).

    The cf/azs cells have no nn.Dropout member in the reference, but their
    per-step CrossAttention does (p=0.2, ``lsthm_cf.py:57-71``) — in train
    mode the attention dropout key rides along as a scan input."""
    K_l, b_l, K_a, b_a, sWih, sbih, sWhh, sbhh, wq, wk = consts
    h_l, c_l, h_a, c_a, h_s, c_s, z, q = carry
    if training:
        xlp, xap, qm, key = xs
    else:
        xlp, xap, qm = xs
        key = None

    q0_sel = select_parties(q, qm)
    xs_proj = jnp.matmul(q0_sel, sWih) + sbih
    h_s, c_s = lstm_step(xs_proj, h_s, c_s, sWhh, sbhh)
    q_affine = h_s
    q = _broadcast_scatter(q0_sel, q_affine, qm)

    if use_speaker_term:
        state_l = jnp.concatenate([h_l, z, q_affine], axis=-1)
        state_a = jnp.concatenate([h_a, z, q_affine], axis=-1)
    else:
        state_l = jnp.concatenate([h_l, z], axis=-1)
        state_a = jnp.concatenate([h_a, z], axis=-1)
    c_l, h_l = lsthm_gates(xlp + jnp.matmul(state_l, K_l) + b_l, c_l)
    c_a, h_a = lsthm_gates(xap + jnp.matmul(state_a, K_a) + b_a, c_a)

    z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, not training, key)
    return (h_l, c_l, h_a, c_a, h_s, c_s, z, q), (h_l, h_a, z, q_affine)


def _shared_lstm_step_stacked(consts, carry, xs, use_speaker_term,
                              training=False):
    """Modality-stacked cf/azs step (config.STACK_MODALITIES): l and a are
    independent within a step (both read only carry z [+ this step's
    q_affine]), so their concat->matmul->gates chains ride a leading
    modality axis — one batched einsum + one gate pass instead of two
    serial op groups. Same math as ``_shared_lstm_step``."""
    K, b, sWih, sbih, sWhh, sbhh, wq, wk = consts
    h_la, c_la, h_s, c_s, z, q = carry  # h_la/c_la: [2, B, H]
    if training:
        xp, qm, key = xs
    else:
        xp, qm = xs
        key = None

    q0_sel = select_parties(q, qm)
    xs_proj = jnp.matmul(q0_sel, sWih) + sbih
    h_s, c_s = lstm_step(xs_proj, h_s, c_s, sWhh, sbhh)
    q_affine = h_s
    q = _broadcast_scatter(q0_sel, q_affine, qm)

    shared = (jnp.concatenate([z, q_affine], axis=-1)
              if use_speaker_term else z)
    state = jnp.concatenate(
        [h_la, jnp.broadcast_to(shared[None], (2,) + shared.shape)], axis=-1)
    sums = xp + jnp.einsum("mbi,mio->mbo", state, K) + b
    c_la, h_la = lsthm_gates(sums, c_la)

    z = rank1_cross_attention(c_la[0], c_la[1], wq, wk, 0.2,
                              not training, key)
    return (h_la, c_la, h_s, c_s, z, q), (h_la, z, q_affine)


def _fused_shared_lstm(cell_f, cell_b, inputs_f, inputs_b, use_speaker_term,
                       emit_q, deterministic, make_rng=None):
    """Run both cf/azs directions as one scan with a direction-vmapped step
    (thin wrapper over ``_fused_directions``; the shared-LSTMCell step
    emits (h_l, h_a, z, q_affine) which is concatenated per direction).
    inputs_*: (x_l, x_a, qmask) per direction."""
    import functools

    from ser_tpu import config

    if config.stack_modalities("cf"):
        def init(consts_f, B, P):
            H = consts_f[0].shape[-1] // 4
            zb = lambda *s: jnp.zeros(s, inputs_f[0].dtype)
            return (zb(2, B, H), zb(2, B, H), zb(B, H), zb(B, H),
                    zb(B, H), zb(B, P, H))

        h_la, z, q_affine = _fused_directions(
            cell_f, cell_b, inputs_f, inputs_b,
            functools.partial(_shared_lstm_step_stacked,
                              use_speaker_term=use_speaker_term),
            n_state=0, deterministic=deterministic, make_rng=make_rng,
            init=init, train_unroll=config.scan_unroll("cf"))
        parts_fb = []
        for d in range(2):
            parts = [h_la[d][:, 0], h_la[d][:, 1], z[d]]
            if emit_q:
                parts.append(q_affine[d])
            parts_fb.append(jnp.concatenate(parts, axis=-1))
        return parts_fb[0], parts_fb[1]  # h_b is reversed-time

    h_l, h_a, z, q_affine = _fused_directions(
        cell_f, cell_b, inputs_f, inputs_b,
        functools.partial(_shared_lstm_step,
                          use_speaker_term=use_speaker_term),
        n_state=7, deterministic=deterministic, make_rng=make_rng,
        train_unroll=config.scan_unroll("cf"))
    parts = [h_l, h_a, z] + ([q_affine] if emit_q else [])
    h_f = jnp.concatenate([p[0] for p in parts], axis=-1)
    h_b = jnp.concatenate([p[1] for p in parts], axis=-1)
    return h_f, h_b  # h_b is reversed-time


# =========================================================================
# MARN1_mf / MARN1_la (encoders + seq attention inside the cell)
# (ref model/lsthm_mf.py:78-220, model/lsthm_la.py:76-228)
# =========================================================================

class MARNCellMF(nn.Module):
    """mf: precomputed sequence cross-attention feeds an extra forget gate
    sigmoid(V z) * c (ref ``lsthm_mf.py:27-44,122-131``)."""

    dh: int = 128
    d_in: int = 100

    @nn.compact
    def __call__(self, x, qmask, deterministic: bool = True,
                 mode: str = "run"):
        d_l = self.d_in
        H = self.dh
        x_l = jnp.swapaxes(x[:, :, :d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, d_l : 2 * d_l], 0, 1)
        x_l, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_l")(
            x_l, deterministic=deterministic)
        x_a, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_a")(
            x_a, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        x_la = CrossAttentionSeq(name="crossatt_l2a")(x_l, x_a, deterministic)
        x_al = CrossAttentionSeq(name="crossatt_a2l")(x_a, x_l, deterministic)

        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        Wl, bWl = declare_linear(self, "lsthm_l_W", d_l, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", H, H)  # -> cell_size
        Sl, bSl = declare_linear(self, "lsthm_l_S", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", d_l, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", H, H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", H, 4 * H)
        sWih, sbih = declare_rnn_linear(self, "lstm_s_ih", H, 4 * H, H)
        sWhh, sbhh = declare_rnn_linear(self, "lstm_s_hh", H, 4 * H, H)

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa
        # hoisted z-gates: sigmoid(V x_la) argument for every step
        zg_l = jnp.matmul(x_la, Vl) + bVl  # [L, B, H]
        zg_a = jnp.matmul(x_al, Va) + bVa
        K_l = jnp.concatenate([Ul, Sl], axis=0)
        b_l = bUl + bSl
        K_a = jnp.concatenate([Ua, Sa], axis=0)
        b_a = bUa + bSa

        seqs = (xl_proj, xa_proj, zg_l, zg_a, qmask)
        consts = (K_l, b_l, K_a, b_a, sWih, sbih, sWhh, sbhh)
        if mode == "gather":
            # mf's cell has no in-cell dropout, so direction fusion covers
            # train AND eval.
            return seqs, consts

        z0 = jnp.zeros((B, H), x_l.dtype)
        init = (z0, z0, z0, z0, z0, z0, jnp.zeros((B, P, H), x_l.dtype))

        def step(carry, xs):
            return _mf_step(consts, carry, xs)

        _, (h_l, h_a) = jax.lax.scan(step, init, seqs)
        return jnp.concatenate([h_l, h_a], axis=-1)


def _mf_step(consts, carry, xs):
    """Pure mf recurrence step (vmappable over the direction axis)."""
    K_l, b_l, K_a, b_a, sWih, sbih, sWhh, sbhh = consts
    h_l, c_l, h_a, c_a, h_s, c_s, q = carry
    xlp, xap, zgl, zga, qm = xs

    q0_sel = select_parties(q, qm)
    xs_proj = jnp.matmul(q0_sel, sWih) + sbih
    h_s, c_s = lstm_step(xs_proj, h_s, c_s, sWhh, sbhh)
    q_affine = h_s
    q = _broadcast_scatter(q0_sel, q_affine, qm)

    sums_l = xlp + jnp.matmul(
        jnp.concatenate([h_l, q_affine], axis=-1), K_l) + b_l
    c_l, h_l = lsthm_mf_gates(sums_l, zgl, c_l)
    sums_a = xap + jnp.matmul(
        jnp.concatenate([h_a, q_affine], axis=-1), K_a) + b_a
    c_a, h_a = lsthm_mf_gates(sums_a, zga, c_a)

    return (h_l, c_l, h_a, c_a, h_s, c_s, q), (h_l, h_a)


class MARNCellLA(nn.Module):
    """la: z dropped; inputs gated by softmax of an aux LSTM's cell state
    (ref ``lsthm_la.py:27-43,139-142``). Reference bug kept: BOTH aux gate
    LSTMs consume x_l (``lsthm_la.py:140-141``)."""

    dh: int = 128
    d_in: int = 100

    @nn.compact
    def __call__(self, x, qmask, deterministic: bool = True,
                 mode: str = "run"):
        d_l = self.d_in
        H = self.dh
        x_l = jnp.swapaxes(x[:, :, :d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, d_l : 2 * d_l], 0, 1)
        # encoders declared but not applied (lsthm_la.py:104-105 commented);
        # materialized for parameter-count parity.
        _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_l")(
            jnp.zeros((1, 1, 100)), deterministic=True)
        _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_a")(
            jnp.zeros((1, 1, 100)), deterministic=True)
        # crossatt computed-but-unused in the reference (x_la feeds a V that
        # la's LSTHM never applies); params declared for parity, compute
        # skipped (no gradient either way).
        _ = CrossAttentionSeq(name="crossatt_l2a")(
            jax.lax.stop_gradient(jnp.swapaxes(x_l, 0, 1)[:1, :1]),
            jax.lax.stop_gradient(jnp.swapaxes(x_a, 0, 1)[:1, :1]), True)
        _ = CrossAttentionSeq(name="crossatt_a2l")(
            jax.lax.stop_gradient(jnp.swapaxes(x_a, 0, 1)[:1, :1]),
            jax.lax.stop_gradient(jnp.swapaxes(x_l, 0, 1)[:1, :1]), True)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        Wl, bWl = declare_linear(self, "lsthm_l_W", d_l, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        declare_linear(self, "lsthm_l_V", H, H)  # unused (la drops z)
        Sl, bSl = declare_linear(self, "lsthm_l_S", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", d_l, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        declare_linear(self, "lsthm_a_V", H, H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", H, 4 * H)
        sWih, sbih = declare_rnn_linear(self, "lstm_s_ih", H, 4 * H, H)
        sWhh, sbhh = declare_rnn_linear(self, "lstm_s_hh", H, 4 * H, H)
        glWih, glbih = declare_rnn_linear(self, "lstm_la_l_ih", d_l, 4 * d_l, d_l)
        glWhh, glbhh = declare_rnn_linear(self, "lstm_la_l_hh", d_l, 4 * d_l, d_l)
        gaWih, gabih = declare_rnn_linear(self, "lstm_la_a_ih", d_l, 4 * d_l, d_l)
        gaWhh, gabhh = declare_rnn_linear(self, "lstm_la_a_hh", d_l, 4 * d_l, d_l)

        K_l = jnp.concatenate([Ul, Sl], axis=0)
        b_l = bUl + bSl
        K_a = jnp.concatenate([Ua, Sa], axis=0)
        b_a = bUa + bSa
        # aux gate LSTMs both read x_l (reference bug) — hoist x projections
        gl_proj = jnp.matmul(x_l, glWih) + glbih
        ga_proj = jnp.matmul(x_l, gaWih) + gabih

        seqs = (x_l, x_a, gl_proj, ga_proj, qmask)
        consts = (Wl, bWl, K_l, b_l, Wa, bWa, K_a, b_a,
                  sWih, sbih, sWhh, sbhh, glWhh, glbhh, gaWhh, gabhh)
        if mode == "gather":
            # la's cell has no in-cell dropout, so direction fusion covers
            # train AND eval.
            return seqs, consts

        zH = jnp.zeros((B, H), x_l.dtype)
        zD = jnp.zeros((B, d_l), x_l.dtype)
        init = (zH, zH, zH, zH, zH, zH, zD, zD, zD, zD,
                jnp.zeros((B, P, H), x_l.dtype))

        def step(carry, xs):
            return _la_step(consts, carry, xs)

        _, (h_l, h_a) = jax.lax.scan(step, init, seqs)
        return jnp.concatenate([h_l, h_a], axis=-1)


def _la_step(consts, carry, xs):
    """Pure la recurrence step (vmappable over the direction axis)."""
    (Wl, bWl, K_l, b_l, Wa, bWa, K_a, b_a,
     sWih, sbih, sWhh, sbhh, glWhh, glbhh, gaWhh, gabhh) = consts
    h_l, c_l, h_a, c_a, h_s, c_s, hgl, cgl, hga, cga, q = carry
    xl_t, xa_t, glp, gap, qm = xs

    q0_sel = select_parties(q, qm)
    xs_proj = jnp.matmul(q0_sel, sWih) + sbih
    h_s, c_s = lstm_step(xs_proj, h_s, c_s, sWhh, sbhh)
    q_affine = h_s
    q = _broadcast_scatter(q0_sel, q_affine, qm)

    hgl, cgl = lstm_step(glp, hgl, cgl, glWhh, glbhh)
    hga, cga = lstm_step(gap, hga, cga, gaWhh, gabhh)

    in_l = jax.nn.softmax(cgl, axis=-1) * xl_t
    in_a = jax.nn.softmax(cga, axis=-1) * xa_t
    sums_l = jnp.matmul(in_l, Wl) + bWl + jnp.matmul(
        jnp.concatenate([h_l, q_affine], axis=-1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    sums_a = jnp.matmul(in_a, Wa) + bWa + jnp.matmul(
        jnp.concatenate([h_a, q_affine], axis=-1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)

    return (h_l, c_l, h_a, c_a, h_s, c_s, hgl, cgl, hga, cga, q), (h_l, h_a)


class _NoAttnBidir(nn.Module):
    """Shared mf/la top level: bidirectional cells over raw x, plain head
    (ref ``lsthm_mf.py:158-220``, ``lsthm_la.py:166-228``). Both directions
    run as ONE scan with a direction-vmapped step (the cells have no in-cell
    dropout, so the fusion is exact in train and eval)."""

    cell_cls: type
    n_classes: int = 6

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        rev_x = reverse_seq(x, umask)
        rev_qmask = reverse_seq(qmask, umask)
        if self.cell_cls is MARNCellMF:
            step_fn, la_init = _mf_step, None  # default init (6 H-states)
        else:
            step_fn = _la_step

            def la_init(consts_f, B, P):
                d_l, H = consts_f[0].shape[0], consts_f[0].shape[1] // 4
                zb = lambda *s: jnp.zeros(s, x.dtype)
                return (tuple(zb(B, H) for _ in range(6))
                        + tuple(zb(B, d_l) for _ in range(4))
                        + (zb(B, P, H),))

        from ser_tpu import config

        # mf/la steps are dropout-free inside the cell -> thread_keys=False
        h_l, h_a = _fused_directions(
            self.cell_cls(name="marn_cell_f"),
            self.cell_cls(name="marn_cell_b"),
            (x, qmask), (rev_x, rev_qmask), step_fn,
            n_state=6, deterministic=deterministic, qmask_idx=1,
            init=la_init, thread_keys=False,
            train_unroll=config.scan_unroll(
                "la" if self.cell_cls is MARNCellLA else "mf"))

        h_f = Dropout(0.5, name="dropout_rec")(
            jnp.concatenate([h_l[0], h_a[0]], axis=-1), deterministic)
        h_b = Dropout(0.5, name="dropout_rec_b")(
            reverse_seq(jnp.concatenate([h_l[1], h_a[1]], axis=-1), umask),
            deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)
        _ = TorchLinear(32, name="linear")(jnp.zeros((1, h.shape[-1])))
        logp = _logp_head(self, h, self.n_classes, deterministic=deterministic)
        return (logp,)


def MARN1MF(n_classes=6):
    return _NoAttnBidir(MARNCellMF, n_classes, name=None)


def MARN1LA(n_classes=6):
    return _NoAttnBidir(MARNCellLA, n_classes, name=None)


# =========================================================================
# MARN1_sps (per-party dual LSTMCells with batch compaction)
# (ref model/lsthm_sps.py:132-409)
# =========================================================================

class MARNCellSPS(nn.Module):
    """sps recurrence. The reference partitions the batch by current speaker,
    COMPACTS each party's rows to the front of a zero-padded [N, D] buffer,
    runs a per-party LSTMCell over the compacted buffer with slot-indexed
    carry, and re-concatenates [h_q0[:N0], h_q1[:N1]] — so the speaker state
    fed to the LSTHMs is PERMUTED relative to batch order (party-0 rows
    first). That misalignment is trained-in behavior; we reproduce it with a
    stable argsort permutation (ref ``lsthm_sps.py:175-259``)."""

    dh: int = 128
    d_in: int = 100
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x_l, x_a, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        H = self.dh

        Wl, bWl = declare_linear(self, "lsthm_l_W", self.d_in, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", H, 4 * H)
        Sl, bSl = declare_linear(self, "lsthm_l_S", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", self.d_in, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", H, 4 * H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", H, 4 * H)
        q0Wih, q0bih = declare_rnn_linear(self, "lstm_q0_ih", H, 4 * H, H)
        q0Whh, q0bhh = declare_rnn_linear(self, "lstm_q0_hh", H, 4 * H, H)
        q1Wih, q1bih = declare_rnn_linear(self, "lstm_q1_ih", H, 4 * H, H)
        q1Whh, q1bhh = declare_rnn_linear(self, "lstm_q1_hh", H, 4 * H, H)
        declare_rnn_linear(self, "lstm_s_ih", H, 4 * H, H)  # unused parity
        declare_rnn_linear(self, "lstm_s_hh", H, 4 * H, H)
        wq = self.param("crossatt_l2a_Wq", tinit.ones, (H,))
        wk = self.param("crossatt_l2a_Wk", tinit.ones, (H,))
        self.param("crossatt_l2a_Wv", tinit.ones, (H,))
        self.param("crossatt_a2l_Wq", tinit.ones, (H,))
        self.param("crossatt_a2l_Wk", tinit.ones, (H,))
        self.param("crossatt_a2l_Wv", tinit.ones, (H,))

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa
        K_l = jnp.concatenate([Ul, Vl, Sl], axis=0)
        b_l = bUl + bVl + bSl
        K_a = jnp.concatenate([Ua, Va, Sa], axis=0)
        b_a = bUa + bVa + bSa

        # Per-party LSTMCell weights stacked on a party axis so both cells
        # run as ONE batched matmul inside the scan (the TPU executes ops
        # serially; halving per-step op count matters more than op size
        # at these shapes).
        qWih = jnp.stack([q0Wih, q1Wih])  # [2, H, 4H]
        qbih = jnp.stack([q0bih, q1bih])  # [2, 4H]
        qWhh = jnp.stack([q0Whh, q1Whh])
        qbhh = jnp.stack([q0bhh, q1bhh])

        # The compaction permutation depends only on qmask — hoist the
        # argmax/argsort for ALL steps out of the scan (per-step sorts on
        # the scan's critical path were the sps variant's whole throughput
        # gap vs onlysp).
        order0, order1, n0, n1 = _sps_orders(qmask)

        if mode == "gather":
            return ((xl_proj, xa_proj, qmask, order0, order1, n0, n1),
                    (K_l, b_l, K_a, b_a, qWih, qbih, qWhh, qbhh, wq, wk))

        keys = _dropout_keys(self, deterministic, L, 4)
        slots = jnp.arange(B)

        def step(carry, xs):
            (h_l, c_l, h_a, c_a, h_q0, c_q0, h_q1, c_q1, z, q) = carry
            xlp, xap, qm, ord0, ord1, np0, np1, key = xs
            ks = None if deterministic else key

            # Zero-padded compaction: rows whose speaker == party, in batch
            # order, moved to the front; selected memory is q[row, party].
            q_sel = jnp.stack([q[ord0, 0], q[ord1, 1]])  # [2, B, H]
            n = jnp.stack([np0, np1])  # [2]
            q_sel = q_sel * (slots[None, :] < n[:, None])[..., None].astype(
                q.dtype)

            # both parties' LSTMCells in one batched step; when a party has
            # no speakers this step, its carry is left untouched (the
            # reference skips the cell call entirely).
            h_q = jnp.stack([h_q0, h_q1])
            c_q = jnp.stack([c_q0, c_q1])
            nh, nc = lstm_step(
                jnp.matmul(q_sel, qWih) + qbih[:, None, :],
                h_q, c_q, qWhh, qbhh[:, None, :])
            nh = dropout(nh, self.dropout_rate, deterministic,
                         None if deterministic else ks[0])
            alive = (n > 0)[:, None, None]
            h_qs = jnp.where(alive, nh, h_q)
            c_qs = jnp.where(alive, nc, c_q)
            h_q0, c_q0 = h_qs[0], c_qs[0]
            h_q1, c_q1 = h_qs[1], c_qs[1]

            # h_q = cat([h_q0[:N0], h_q1[:N1]]); h_0 likewise — slot k takes
            # h_q0[k] if k < N0 else h_q1[k - N0]. (Degenerate N0==0 /
            # N1==0 branches collapse into the same formula.)
            take0 = (slots < np0)[:, None]
            gather1 = jnp.clip(slots - np0, 0, B - 1)
            h_q = jnp.where(take0, h_q0, h_q1[gather1])
            h_0 = jnp.where(take0, q_sel[0], q_sel[1][gather1])
            q = _broadcast_scatter(h_0, h_q, qm)

            sums_l = xlp + jnp.matmul(
                jnp.concatenate([h_l, z, h_q], axis=-1), K_l) + b_l
            c_l, h_l = lsthm_gates(sums_l, c_l)
            h_l = dropout(h_l, self.dropout_rate, deterministic,
                          None if deterministic else ks[1])
            sums_a = xap + jnp.matmul(
                jnp.concatenate([h_a, z, h_q], axis=-1), K_a) + b_a
            c_a, h_a = lsthm_gates(sums_a, c_a)
            h_a = dropout(h_a, self.dropout_rate, deterministic,
                          None if deterministic else ks[2])

            z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, deterministic,
                                      None if deterministic else ks[3])
            y = jnp.concatenate([h_l, h_a, z, h_q], axis=-1)
            return (h_l, c_l, h_a, c_a, h_q0, c_q0, h_q1, c_q1, z, q), y

        z0 = jnp.zeros((B, H), x_l.dtype)
        init = (z0, z0, z0, z0, z0, z0, z0, z0, z0,
                jnp.zeros((B, P, H), x_l.dtype))
        _, h = jax.lax.scan(
            step, init,
            (xl_proj, xa_proj, qmask, order0, order1, n0, n1, keys))
        return h


def _sps_orders(qmask):
    """Hoisted sps compaction indices for all steps (depend only on qmask):
    per-party stable-argsort permutations [L, B] and party counts [L]."""
    idx = jnp.argmax(qmask, axis=2)  # [L, B]
    is0, is1 = idx == 0, idx == 1
    # parties >= 2 are excluded from BOTH compactions (the reference's
    # ``_select_parties`` has no branch for them, ``lsthm_sps.py:241-246``)
    order0 = jnp.argsort(jnp.where(is0, 0, 1), axis=1, stable=True)
    order1 = jnp.argsort(jnp.where(is1, 0, 1), axis=1, stable=True)
    n0 = jnp.sum(is0.astype(jnp.int32), axis=1)
    n1 = jnp.sum(is1.astype(jnp.int32), axis=1)
    return order0, order1, n0, n1


def _sps_step(consts, carry, xs, dropout_rate, training):
    """Pure sps recurrence step (vmappable). The compaction permutations
    arrive precomputed (``_sps_orders``) and the two party LSTMCells run as
    one batched matmul — nothing on the critical path sorts or branches."""
    (K_l, b_l, K_a, b_a, qWih, qbih, qWhh, qbhh, wq, wk) = consts
    h_l, c_l, h_a, c_a, h_q0, c_q0, h_q1, c_q1, z, q = carry
    if training:
        xlp, xap, qm, ord0, ord1, n0, n1, key = xs
        ks = jax.random.split(key, 4)
        det = False
    else:
        xlp, xap, qm, ord0, ord1, n0, n1 = xs
        ks = [None] * 4
        det = True

    B = q.shape[0]
    slots = jnp.arange(B)

    q_sel = jnp.stack([q[ord0, 0], q[ord1, 1]])  # [2, B, H]
    n = jnp.stack([n0, n1])
    q_sel = q_sel * (slots[None, :] < n[:, None])[..., None].astype(q.dtype)

    h_q = jnp.stack([h_q0, h_q1])
    c_q = jnp.stack([c_q0, c_q1])
    nh, nc = lstm_step(
        jnp.matmul(q_sel, qWih) + qbih[:, None, :],
        h_q, c_q, qWhh, qbhh[:, None, :])
    nh = dropout(nh, dropout_rate, det, ks[0])
    alive = (n > 0)[:, None, None]
    h_qs = jnp.where(alive, nh, h_q)
    c_qs = jnp.where(alive, nc, c_q)
    h_q0, c_q0 = h_qs[0], c_qs[0]
    h_q1, c_q1 = h_qs[1], c_qs[1]

    take0 = (slots < n0)[:, None]
    gather1 = jnp.clip(slots - n0, 0, B - 1)
    h_q = jnp.where(take0, h_q0, h_q1[gather1])
    h_0 = jnp.where(take0, q_sel[0], q_sel[1][gather1])
    q = _broadcast_scatter(h_0, h_q, qm)

    sums_l = xlp + jnp.matmul(jnp.concatenate([h_l, z, h_q], -1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    h_l = dropout(h_l, dropout_rate, det, ks[1])
    sums_a = xap + jnp.matmul(jnp.concatenate([h_a, z, h_q], -1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)
    h_a = dropout(h_a, dropout_rate, det, ks[2])

    z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, det, ks[3])
    y = jnp.concatenate([h_l, h_a, z, h_q], axis=-1)
    return (h_l, c_l, h_a, c_a, h_q0, c_q0, h_q1, c_q1, z, q), y


class MARN1SPS(nn.Module):
    """MARN1_sps top level (ref ``lsthm_sps.py:298-409``): residual-stacked
    encoders enc(x + enc(x)), learnable scalar fusion + re-attention, and a
    residual head fc(feats) + x_l + x_a."""

    n_classes: int = 6
    d_r: int = 1024
    d_l: int = 100
    d_a: int = 100

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_r], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_r : self.d_r + self.d_a], 0, 1)
        x_l = TorchLinear(self.d_l, name="linear_in")(x_l)

        enc_l = EncoderLayer(100, 40, 8, 40, 40, name="encoder_l")
        enc_a = EncoderLayer(100, 40, 8, 40, 40, name="encoder_a")
        x_l_1, _ = enc_l(x_l, deterministic=deterministic)
        x_a_1, _ = enc_a(x_a, deterministic=deterministic)
        x_l, _ = enc_l(x_l + x_l_1, deterministic=deterministic)
        x_a, _ = enc_a(x_a + x_a_1, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        import functools

        cell_f = MARNCellSPS(name="marn_cell_f")
        h_f, h_b = _fused_directions(
            cell_f, MARNCellSPS(name="marn_cell_b"),
            (x_l, x_a, qmask),
            (reverse_seq(x_l, umask), reverse_seq(x_a, umask),
             reverse_seq(qmask, umask)),
            functools.partial(_sps_step, dropout_rate=cell_f.dropout_rate),
            n_state=9, deterministic=deterministic,
            make_rng=lambda: self.make_rng("dropout"))
        h_f = Dropout(0.5, name="dropout_rec")(h_f, deterministic)
        h_b = Dropout(0.5, name="dropout_rec_b")(
            reverse_seq(h_b, umask), deterministic)
        h = jnp.concatenate([h_f, h_b], axis=-1)

        w = self.param("w", tinit.ones, (1,))
        v = self.param("v", tinit.ones, (1,))
        v1 = self.param("v1", tinit.ones, (1,))
        v2 = self.param("v2", tinit.ones, (1,))
        seq_mods = (CrossAttentionSeq(name="crossatt_l2a"),
                    CrossAttentionSeq(name="crossatt_a2l"))
        reseq_mods = (CrossAttentionReSeq(name="crossatt_l2a_1"),
                      CrossAttentionReSeq(name="crossatt_a2l_1"))
        from ser_tpu import config

        if config.tail_paired():
            # Pair-batched tail (same gate/contract as MARN1_onlysp).
            from ser_tpu.ops.attention import paired_attention_tail

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

        feats = jnp.concatenate([h, attn1, attn2], axis=-1)
        out = TorchLinear(self.d_l, name="fc_0")(feats)
        out = nn.relu(out)
        out = Dropout(0.5, name="fc_drop")(out, deterministic)
        logp = _logp_head(self, out + x_l + x_a, self.n_classes,
                          deterministic=deterministic)
        return logp, x_l, x_a


# =========================================================================
# MARN1_nsps / MARN1_no_en (GRU speaker + listener pass-through)
# (ref model/lsthm_nsps.py:140-375, model/lsthm_no_en.py)
# =========================================================================

class MARNCellNSPS(nn.Module):
    """nsps recurrence (ref ``lsthm_nsps.py:140-239``): GRU speaker on the
    concatenated features U = x[i]; listener = pass-through of the OTHER
    party's memory; q update broadcasts the listener value to non-speaker
    slots (equivalent to a masked scatter for 2 parties)."""

    dh: int = 128
    d_in: int = 200  # d_l + d_a
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, x_l, x_a, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]
        H = self.dh

        Wl, bWl = declare_linear(self, "lsthm_l_W", x_l.shape[-1], 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", H, 4 * H)
        Sl, bSl = declare_linear(self, "lsthm_l_S", H, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", x_a.shape[-1], 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", H, 4 * H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", H, 4 * H)
        gWih, gbih = declare_rnn_linear(self, "gru_s_ih", self.d_in, 3 * H, H)
        gWhh, gbhh = declare_rnn_linear(self, "gru_s_hh", H, 3 * H, H)
        declare_rnn_linear(self, "gru_l_ih", self.d_in, 3 * H, H)  # unused
        declare_rnn_linear(self, "gru_l_hh", H, 3 * H, H)
        wq = self.param("crossatt_l2a_Wq", tinit.ones, (H,))
        wk = self.param("crossatt_l2a_Wk", tinit.ones, (H,))
        self.param("crossatt_l2a_Wv", tinit.ones, (H,))
        self.param("crossatt_a2l_Wq", tinit.ones, (H,))
        self.param("crossatt_a2l_Wk", tinit.ones, (H,))
        self.param("crossatt_a2l_Wv", tinit.ones, (H,))

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa
        gru_x = jnp.matmul(x, gWih) + gbih
        K_l = jnp.concatenate([Ul, Vl, Sl], axis=0)
        b_l = bUl + bVl + bSl
        K_a = jnp.concatenate([Ua, Va, Sa], axis=0)
        b_a = bUa + bVa + bSa

        if mode == "gather":
            return ((xl_proj, xa_proj, gru_x, qmask),
                    (K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk))

        keys = _dropout_keys(self, deterministic, L, 4)

        def step(carry, xs):
            h_l, c_l, h_a, c_a, z, q = carry
            xlp, xap, gxp, qm, key = xs
            ks = None if deterministic else key

            idx = jnp.argmax(qm, axis=1)
            onehot = jax.nn.one_hot(idx, P, dtype=q.dtype)
            qs_0 = jnp.einsum("bp,bpd->bd", onehot, q)
            # listener party = (1 - idx) mod P: torch's ``j[1 - idx]``
            # (lsthm_nsps.py:236) wraps negative indices, so speaker 2 at
            # MELD's P=9 reads party 8 — one_hot of a bare negative index
            # would silently zero it instead.
            other = jax.nn.one_hot((1 - idx) % P, P, dtype=q.dtype)
            ql_0 = jnp.einsum("bp,bpd->bd", other, q)

            h_s = gru_step(gxp, qs_0, gWhh, gbhh)
            h_s = dropout(h_s, self.dropout_rate, deterministic,
                          None if deterministic else ks[0])
            m = qm[:, :, None]
            q = ql_0[:, None, :] * (1.0 - m) + h_s[:, None, :] * m

            sums_l = xlp + jnp.matmul(
                jnp.concatenate([h_l, z, h_s], axis=-1), K_l) + b_l
            c_l, h_l = lsthm_gates(sums_l, c_l)
            h_l = dropout(h_l, self.dropout_rate, deterministic,
                          None if deterministic else ks[1])
            sums_a = xap + jnp.matmul(
                jnp.concatenate([h_a, z, h_s], axis=-1), K_a) + b_a
            c_a, h_a = lsthm_gates(sums_a, c_a)
            h_a = dropout(h_a, self.dropout_rate, deterministic,
                          None if deterministic else ks[2])

            z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, deterministic,
                                      None if deterministic else ks[3])
            ys = (h_l, h_a, h_s, ql_0)
            return (h_l, c_l, h_a, c_a, z, q), ys

        z0 = jnp.zeros((B, H), x_l.dtype)
        init = (z0, z0, z0, z0, z0, jnp.zeros((B, P, H), x_l.dtype))
        _, (hl, ha, hsp, hli) = jax.lax.scan(
            step, init, (xl_proj, xa_proj, gru_x, qmask, keys))
        return hl, ha, hsp, hli


def _nsps_step(consts, carry, xs, dropout_rate, training):
    """Pure nsps recurrence step (vmappable over the direction axis)."""
    K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk = consts
    h_l, c_l, h_a, c_a, z, q = carry
    if training:
        xlp, xap, gxp, qm, key = xs
        ks = jax.random.split(key, 4)
        det = False
    else:
        xlp, xap, gxp, qm = xs
        ks = [None] * 4
        det = True

    P = q.shape[1]
    idx = jnp.argmax(qm, axis=1)
    onehot = jax.nn.one_hot(idx, P, dtype=q.dtype)
    qs_0 = jnp.einsum("bp,bpd->bd", onehot, q)
    # (1 - idx) mod P mirrors torch's negative-index wrap (lsthm_nsps.py:236)
    other = jax.nn.one_hot((1 - idx) % P, P, dtype=q.dtype)
    ql_0 = jnp.einsum("bp,bpd->bd", other, q)

    h_s = gru_step(gxp, qs_0, gWhh, gbhh)
    h_s = dropout(h_s, dropout_rate, det, ks[0])
    m = qm[:, :, None]
    q = ql_0[:, None, :] * (1.0 - m) + h_s[:, None, :] * m

    sums_l = xlp + jnp.matmul(jnp.concatenate([h_l, z, h_s], -1), K_l) + b_l
    c_l, h_l = lsthm_gates(sums_l, c_l)
    h_l = dropout(h_l, dropout_rate, det, ks[1])
    sums_a = xap + jnp.matmul(jnp.concatenate([h_a, z, h_s], -1), K_a) + b_a
    c_a, h_a = lsthm_gates(sums_a, c_a)
    h_a = dropout(h_a, dropout_rate, det, ks[2])

    z = rank1_cross_attention(c_l, c_a, wq, wk, 0.2, det, ks[3])
    return (h_l, c_l, h_a, c_a, z, q), (h_l, h_a, h_s, ql_0)


class MARN1NSPS(nn.Module):
    """MARN1_nsps / MARN1_no_en top level (ref ``lsthm_nsps.py:242-375``).

    ``use_text_encoder=False`` gives no_en (text encoder calls commented out
    in the reference; params still exist — we keep them for parity)."""

    n_classes: int = 6
    use_text_encoder: bool = True
    d_r: int = 1024
    d_l: int = 100
    d_a: int = 100

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_r], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_r : self.d_r + self.d_a], 0, 1)
        x_l = TorchLinear(self.d_l, name="linear_in")(x_l)
        xcat = jnp.swapaxes(jnp.concatenate([x_l, x_a], axis=2), 0, 1)

        enc_l = EncoderLayer(self.d_l, 40, 8, 40, 40, name="encoder_l")
        enc_a = EncoderLayer(self.d_a, 40, 8, 40, 40, name="encoder_a")
        if self.use_text_encoder:
            x_l_1, _ = enc_l(x_l, deterministic=deterministic)
            x_l, _ = enc_l(x_l + x_l_1, deterministic=deterministic)
        else:
            # params exist but the encoder is bypassed (lsthm_no_en.py:306-310)
            _ = enc_l(jnp.zeros((1, 1, self.d_l)), deterministic=True)
        x_a_1, _ = enc_a(x_a, deterministic=deterministic)
        x_a, _ = enc_a(x_a + x_a_1, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        import functools

        drop = Dropout(0.5, name="dropout_rec")
        rev_x = reverse_seq(xcat, umask)
        rev_x_l = reverse_seq(x_l, umask)
        rev_x_a = reverse_seq(x_a, umask)
        rev_qmask = reverse_seq(qmask, umask)
        cell_f = MARNCellNSPS(name="marn_cell_f")
        (hf_l, hb_l), (hf_a, hb_a), _, _ = _fused_directions(
            cell_f,
            MARNCellNSPS(name="marn_cell_b"),
            (xcat, x_l, x_a, qmask), (rev_x, rev_x_l, rev_x_a, rev_qmask),
            functools.partial(_nsps_step, dropout_rate=cell_f.dropout_rate),
            n_state=5, deterministic=deterministic,
            make_rng=lambda: self.make_rng("dropout"), qmask_idx=3)
        hf_l = drop(hf_l, deterministic)
        hf_a = drop(hf_a, deterministic)
        hb_l = drop(reverse_seq(hb_l, umask), deterministic)
        hb_a = drop(reverse_seq(hb_a, umask), deterministic)

        h_l = jnp.concatenate([hf_l, hb_l], axis=-1)  # [L, B, 256]
        h_a = jnp.concatenate([hf_a, hb_a], axis=-1)

        attn1 = CrossAttentionSeqLN(self.d_l, self.d_l, self.d_l,
                                    name="crossatt_l2a")(x_l, x_a, deterministic)
        attn2 = CrossAttentionSeqLN(self.d_a, self.d_a, self.d_a,
                                    name="crossatt_a2l")(x_a, x_l, deterministic)

        p = self.param("p", tinit.ones, (2,))
        pw = jax.nn.softmax(p)

        final_out = 2 * (2 * 128 + self.d_l)
        resid_l = TorchLinear(final_out, name="fc_0")(x_l)
        resid_l = Dropout(0.5, name="fc_drop")(nn.relu(resid_l), deterministic)
        # fc2 (resid_a) computed-but-unused in the reference head
        # (lsthm_nsps.py:351,355) — params declared for parity.
        _ = TorchLinear(final_out, name="fc2_0")(
            jax.lax.stop_gradient(x_a[:1, :1]))

        left = jnp.concatenate([h_l, attn2], axis=2)
        right = jnp.concatenate([h_a, attn1], axis=2)
        feats = jnp.concatenate([pw[0] * left, pw[1] * right], axis=-1)
        logp = _logp_head(self, feats + resid_l, self.n_classes,
                          deterministic=deterministic)
        return logp, x_l, x_a


def register_variants(register, ModelSpec, marn1_inputs):
    register(ModelSpec(
        name="MARN1_sp",
        build=lambda n_classes, dataset: MARN1SP(n_classes=n_classes),
        make_inputs=marn1_inputs, feature_outputs=True))
    register(ModelSpec(
        name="MARN1_sps",
        build=lambda n_classes, dataset: MARN1SPS(n_classes=n_classes),
        make_inputs=marn1_inputs, feature_outputs=True))
    register(ModelSpec(
        name="MARN1_nsps",
        build=lambda n_classes, dataset: MARN1NSPS(n_classes=n_classes),
        make_inputs=marn1_inputs, feature_outputs=True))
    register(ModelSpec(
        name="MARN1_no_en",
        build=lambda n_classes, dataset: MARN1NSPS(
            n_classes=n_classes, use_text_encoder=False),
        make_inputs=marn1_inputs, feature_outputs=True))
    register(ModelSpec(
        name="MARN1_cf",
        build=lambda n_classes, dataset: MARN1CF(n_classes=n_classes),
        make_inputs=marn1_inputs, feature_outputs=True))
    register(ModelSpec(
        name="MARN1_mf",
        build=lambda n_classes, dataset: MARN1MF(n_classes=n_classes),
        make_inputs=marn1_inputs))
    register(ModelSpec(
        name="MARN1_la",
        build=lambda n_classes, dataset: MARN1LA(n_classes=n_classes),
        make_inputs=marn1_inputs))
    register(ModelSpec(
        name="MARN1_azs",
        build=lambda n_classes, dataset: MARN1AZS(n_classes=n_classes),
        make_inputs=marn1_inputs))
