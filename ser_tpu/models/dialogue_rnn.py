"""DialogueRNN baseline suite (ref ``/root/reference/model/DialogueRNN.py``).

``BiModel`` is the trainer-facing bidirectional model (D_m=712, D_g=D_p=500,
D_e=300, D_h=300, listener_state=True, context attention 'general',
``model_trainer.py:35-47``).

TPU-first changes (math-preserving):
- the reference grows ``g_hist`` by ``torch.cat`` every step (O(T^2) memory
  traffic, ``DialogueRNN.py:193``); we carry a fixed-size [L, B, D_g] buffer
  plus a step index and mask attention logits beyond the current step — the
  softmax over the valid prefix is identical;
- the per-step ``matchatt`` pooling loop over the whole sequence
  (``DialogueRNN.py:260-268``) becomes one batched einsum over [L, L];
- party-parallel GRUs (p_cell/l_cell on B*P rows) stay batched matmuls;
  for the P=2 case only the rows the qmask mix actually keeps are computed
  (one p-GRU row + one l-GRU row per batch element, half the rows), with
  the speaker index hoisted out of the scan.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops.cells import declare_linear, declare_rnn_linear, gru_step
from ser_tpu.ops.layers import Dropout, TorchLinear, dropout
from ser_tpu.ops.masking import reverse_seq, select_parties


class DialogueRNNScan(nn.Module):
    """One direction of DialogueRNN (ref ``DialogueRNN.py:80-198``) with
    'general' context attention over the global-state history."""

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    listener_state: bool = False
    dropout_rate: float = 0.5
    context_attention: str = "general"  # 'simple' | 'general' | 'general2'

    @nn.compact
    def __call__(self, U, qmask, deterministic: bool = True,
                 mode: str = "run"):
        L, B, P = U.shape[0], U.shape[1], qmask.shape[2]
        D_m, D_g, D_p, D_e = self.D_m, self.D_g, self.D_p, self.D_e

        gWih, gbih = declare_rnn_linear(self, "g_cell_ih", D_m + D_p, 3 * D_g, D_g)
        gWhh, gbhh = declare_rnn_linear(self, "g_cell_hh", D_g, 3 * D_g, D_g)
        pWih, pbih = declare_rnn_linear(self, "p_cell_ih", D_m + D_g, 3 * D_p, D_p)
        pWhh, pbhh = declare_rnn_linear(self, "p_cell_hh", D_p, 3 * D_p, D_p)
        eWih, ebih = declare_rnn_linear(self, "e_cell_ih", D_p, 3 * D_e, D_e)
        eWhh, ebhh = declare_rnn_linear(self, "e_cell_hh", D_e, 3 * D_e, D_e)
        consts = {"gWih_q": gWih[D_m:], "gWhh": gWhh, "gbhh": gbhh,
                  "pWih_c": pWih[D_m:], "pWhh": pWhh, "pbhh": pbhh,
                  "eWih": eWih, "ebih": ebih, "eWhh": eWhh, "ebhh": ebhh}
        # hoisted x-side projections: one MXU matmul over all steps each
        seqs = {"u": U, "qm": qmask,
                "g_x": jnp.matmul(U, gWih[:D_m]) + gbih,
                "p_x": jnp.matmul(U, pWih[:D_m]) + pbih}
        if self.listener_state:
            lWih, lbih = declare_rnn_linear(
                self, "l_cell_ih", D_m + D_p, 3 * D_p, D_p)
            lWhh, lbhh = declare_rnn_linear(
                self, "l_cell_hh", D_p, 3 * D_p, D_p)
            consts.update({"lWih_s": lWih[D_m:], "lWhh": lWhh, "lbhh": lbhh})
            seqs["l_x"] = jnp.matmul(U, lWih[:D_m]) + lbih
        if self.context_attention == "simple":
            # SimpleAttention: scalar Linear(D_g -> 1, no bias)
            attS, _ = declare_linear(self, "attention_scalar", D_g, 1,
                                     use_bias=False)
            consts["attS"] = attS
        elif self.context_attention == "general":
            # MatchingAttention 'general': Linear(D_m -> D_g, no bias)
            attT, _ = declare_linear(self, "attention_transform", D_m, D_g,
                                     use_bias=False)
            seqs["att_x"] = jnp.matmul(U, attT)
        elif self.context_attention == "general2":
            attT, attB = declare_linear(self, "attention_transform", D_m, D_g,
                                        use_bias=True)
            seqs["att_x"] = jnp.matmul(U, attT) + attB
        else:
            raise ValueError(
                f"unknown context_attention: {self.context_attention}")
        from ser_tpu import config

        if config.drnn_fast2(B, P):
            # P==2 fast path (see _drnn_step): the re-derived speaker
            # one-hot depends only on qmask — hoist it for all steps out
            # of the scan. argmax matches torch's all-zero-row -> party-0
            # pick; kept dense (one-hot, not indices) because TPU row
            # gathers on the scan's critical path lose to VPU mask ops.
            seqs["sp1"] = jax.nn.one_hot(
                jnp.argmax(qmask, axis=2), P, dtype=U.dtype)

        if mode == "gather":
            # expose hoisted projections + kernels so BiModel can run both
            # directions as one direction-vmapped scan.
            return seqs, consts

        training = not deterministic
        import functools

        fn = functools.partial(
            _drnn_step, listener_state=self.listener_state,
            context_attention=self.context_attention,
            dropout_rate=self.dropout_rate, training=training)
        if training:
            seqs["key"] = jax.random.split(self.make_rng("dropout"), L)

        init = _drnn_init(L, B, P, D_g, D_p, D_e, U.dtype)
        if training:
            from ser_tpu import config

            step = config.scan_remat(fn)
        else:
            step = fn
        _, (emotions, alphas) = jax.lax.scan(
            lambda c, xs: step(consts, c, xs), init, seqs)
        return emotions, alphas  # [L, B, D_e], [L, B, L]


def _drnn_init(L, B, P, D_g, D_p, D_e, dtype):
    return (
        jnp.zeros((B, P, D_p), dtype),
        jnp.zeros((B, D_e), dtype),
        jnp.zeros((B, D_g), dtype),
        jnp.zeros((L, B, D_g), dtype),
        jnp.asarray(0, jnp.int32),
    )


# Measurement-only switch (scripts/profile_drnn_att.py): replaces the
# g_hist context attention with zeros to bound its cost (the [L, B, D_g]
# history buffer is the step's dominant HBM traffic). Never set in
# production; parity/golden tests run with it False.
_ABLATE_CONTEXT_ATT = False

# Measurement-only switch: zero the chunked path's alpha reconstruction to
# check XLA DCEs it when the caller drops alphas. Never set in production.
_SKIP_ALPHAS = False


def _drnn_pre(consts, xs, q, g_prev, k0, dropout_rate, deterministic):
    """Speaker select + global-state GRU (the step's pre-attention half)."""
    if "sp1" in xs:
        q0_sel = jnp.einsum("bp,bpd->bd", xs["sp1"], q)  # == select_parties
    else:
        q0_sel = select_parties(q, xs["qm"])
    g_ = gru_step(xs["g_x"] + jnp.matmul(q0_sel, consts["gWih_q"]),
                  g_prev, consts["gWhh"], consts["gbhh"])
    g_ = dropout(g_, dropout_rate, deterministic, k0)
    return g_, q0_sel


def _drnn_step(consts, carry, xs, listener_state, context_attention,
               dropout_rate, training):
    """Pure DialogueRNN step (ref ``DialogueRNN.py:80-157``); vmappable over
    the direction axis. x-side GRU projections arrive hoisted via ``xs``."""
    q, e_prev, g_prev, g_hist, t = carry
    qm = xs["qm"]
    L = g_hist.shape[0]
    B = qm.shape[0]
    deterministic = not training
    ks = jax.random.split(xs["key"], 4) if training else [None] * 4

    g_, q0_sel = _drnn_pre(consts, xs, q, g_prev, ks[0], dropout_rate,
                           deterministic)

    # attention over g_hist prefix (empty prefix -> zeros, alpha None)
    if _ABLATE_CONTEXT_ATT:
        c_ = jnp.zeros_like(g_)
        alpha = jnp.zeros((B, L), g_hist.dtype)
    else:
        if context_attention == "simple":
            scores = jnp.einsum("jbd,dk->bj", g_hist, consts["attS"])
        else:  # 'general' / 'general2' (bias folded into hoisted att_x)
            scores = jnp.einsum("bd,jbd->bj", xs["att_x"], g_hist)
        prefix = (jnp.arange(L)[None, :] < t)
        alpha = jax.nn.softmax(jnp.where(prefix, scores, -1e9), axis=1)
        c_ = jnp.einsum("bj,jbd->bd", alpha, g_hist)
        c_ = jnp.where(t > 0, c_, 0.0)
        alpha = jnp.where(t > 0, alpha, 0.0)

    g_hist = jax.lax.dynamic_update_slice_in_dim(g_hist, g_[None], t, axis=0)

    q_, e_ = _drnn_post(consts, xs, q, e_prev, q0_sel, c_, ks,
                        listener_state, dropout_rate, deterministic)
    return (q_, e_, g_, g_hist, t + 1), (e_, alpha)


def _drnn_post(consts, xs, q, e_prev, q0_sel, c_, ks, listener_state,
               dropout_rate, deterministic, c_projected=False):
    """Party + emotion cells (the step's post-attention half).

    ``c_projected=True`` means ``c_`` already went through ``pWih_c``
    (the chunked path's projection fusion, config.DRNN_PMERGE)."""
    qm = xs["qm"]
    B, P = qm.shape[0], qm.shape[1]
    D_p = q.shape[-1]
    fast2 = "sp1" in xs  # P==2: run party cells only on their kept rows

    if c_projected:
        p_in = xs["p_x"] + c_  # [B, 3*D_p]
    else:
        p_in = xs["p_x"] + jnp.matmul(c_, consts["pWih_c"])  # [B, 3*D_p]
    if fast2:
        # The reference updates ALL B*P party rows with p_cell (and l_cell)
        # and then keeps only the speaker row of qs_ / the listener rows of
        # ql_ via the qmask mix (ref ``DialogueRNN.py:139-152``). With two
        # parties the kept rows are exactly one p-GRU row and one l-GRU row
        # per batch element — run each cell only on its kept row, halving
        # the recurrent matmul rows on the scan's critical path.
        #   select_parties(qs_, qm) == qs_[b, s] == the p-update of q[b, s]
        # (including all-zero qmask rows, where argmax picks party 0), so
        # ss_ is the computed row itself.
        # Deviation (documented in PARITY.md): at all-zero-qmask steps with
        # listener_state the reference l-updates every party, while this
        # path p-updates row s=0 and l-updates row 1. Padding is a suffix
        # in every loader (torch pad_sequence semantics), so those rows are
        # never read by a valid step; their outputs stay finite and are
        # masked from loss/metrics and parity comparisons.
        sp1 = xs["sp1"]
        lis1 = 1.0 - sp1
        q_lis = jnp.einsum("bp,bpd->bd", lis1, q)
        qs_row = gru_step(p_in, q0_sel, consts["pWhh"], consts["pbhh"])
        qs_row = dropout(qs_row, dropout_rate, deterministic, ks[1])
        if listener_state:
            l_in = xs["l_x"] + jnp.matmul(qs_row, consts["lWih_s"])
            ql_row = gru_step(l_in, q_lis,
                              consts["lWhh"], consts["lbhh"])
            ql_row = dropout(ql_row, dropout_rate, deterministic, ks[2])
        else:
            ql_row = q_lis
        q_ = (sp1[:, :, None] * qs_row[:, None, :]
              + lis1[:, :, None] * ql_row[:, None, :])
        e_sel = qs_row  # == select_parties(q_, qm)
    else:
        # party GRU on B*P rows with identical input per party
        p_in_p = jnp.broadcast_to(p_in[:, None, :], (B, P) + p_in.shape[1:])
        qs_ = gru_step(p_in_p.reshape(B * P, -1), q.reshape(B * P, D_p),
                       consts["pWhh"], consts["pbhh"]).reshape(B, P, D_p)
        qs_ = dropout(qs_, dropout_rate, deterministic, ks[1])

        if listener_state:
            ss_ = select_parties(qs_, qm)  # speaker's new state
            l_in = xs["l_x"] + jnp.matmul(ss_, consts["lWih_s"])
            l_in_p = jnp.broadcast_to(
                l_in[:, None, :], (B, P) + l_in.shape[1:])
            ql_ = gru_step(l_in_p.reshape(B * P, -1), q.reshape(B * P, D_p),
                           consts["lWhh"], consts["lbhh"]).reshape(B, P, D_p)
            ql_ = dropout(ql_, dropout_rate, deterministic, ks[2])
        else:
            ql_ = q

        m = qm[:, :, None]
        q_ = ql_ * (1.0 - m) + qs_ * m
        e_sel = select_parties(q_, qm)
    e_ = gru_step(
        jnp.matmul(e_sel, consts["eWih"]) + consts["ebih"],
        e_prev, consts["eWhh"], consts["ebhh"])
    e_ = dropout(e_, dropout_rate, deterministic, ks[3])

    return q_, e_


def _drnn_chunk_step(consts, carry, xs, listener_state, context_attention,
                     dropout_rate, training):
    """Process one chunk of C steps with flash-style context attention.

    The per-step formulation reads the full [L, B, D_g] g_hist buffer twice
    every step (scores + pooling) — measured 60% of the eval pass / 29% of a
    train step at production shapes. Because the attention queries (att_x)
    are hoisted out of the scan, the contribution of all COMPLETED chunks to
    every step in the current chunk is two per-chunk batched matmuls over
    g_hist (one read each, MXU work); the within-chunk contribution comes
    from a small [C, B, D_g] buffer scanned per step. The two merge by exact
    online-softmax (max/sum decomposition, the flash-attention identity), so
    the math equals the per-step masked softmax up to fp reassociation.
    g_hist HBM traffic drops from 2·L reads per pass to 2·L/C.

    xs leaves are [C, ...] per-step slices; carry matches ``_drnn_init``.
    Pure XLA — autodiff and the configured remat policy apply unchanged.
    """
    q0, e0, g0, g_hist, t0 = carry
    C = xs["u"].shape[0]
    L, B, D_g = g_hist.shape
    dtype = g_hist.dtype
    neg = jnp.asarray(jnp.finfo(dtype).min / 2, dtype)
    hi = jax.lax.Precision.HIGHEST  # parity: keep the MXU out of bf16 here
    from ser_tpu import config

    # Projection fusion (config.DRNN_PMERGE): c_ only ever feeds
    # p_in = p_x + c_ @ pWih_c, and the online-softmax merge is linear in
    # its numerators — so push pWih_c through the numerators off the
    # critical path (per-chunk for the past block, at g-write time within
    # the chunk) and merge already-projected [B, 3*D_p] terms in-step.
    # The serial chain loses its [B, D_g] x [D_g, 3*D_p] matmul; the
    # in-step pooling grows from D_g to 3*D_p wide (VPU, C rows — cheap).
    pmerge = config.drnn_pmerge()
    pW = consts["pWih_c"]  # [D_g, 3*D_p]

    # past-chunk block: two g_hist reads PER CHUNK (vs two per step).
    # 'simple' scores are query-independent, so its stats are one [B, ·]
    # set closed over by the inner scan instead of C copies threaded
    # through xs. s_past <= m_past everywhere in both branches, so exp
    # never overflows; masked entries hit exp(0)=1, zeroed by the where.
    query_dep = context_attention != "simple"
    if query_dep:  # 'general' / 'general2' (bias folded into hoisted att_x)
        s_past = jnp.einsum("cbd,jbd->cbj", xs["att_x"], g_hist,
                            precision=hi)
        jmask = jnp.arange(L)[None, None, :] < t0  # completed-chunk rows
        s_past = jnp.where(jmask, s_past, neg)
        m_past = jnp.max(s_past, axis=2)  # [C, B] (empty prefix -> neg)
        w_past = jnp.where(jmask, jnp.exp(s_past - m_past[..., None]), 0.0)
        d_past = jnp.sum(w_past, axis=2)  # [C, B]
        n_past = jnp.einsum("cbj,jbd->cbd", w_past, g_hist, precision=hi)
        if pmerge:
            n_past = jnp.einsum("cbd,dk->cbk", n_past, pW, precision=hi)
    else:
        s_q = jnp.einsum("jbd,dk->bj", g_hist, consts["attS"],
                         precision=hi)  # [B, L]
        jmask1 = jnp.arange(L)[None, :] < t0
        s_q = jnp.where(jmask1, s_q, neg)
        m_past1 = jnp.max(s_q, axis=1)  # [B]
        w_past1 = jnp.where(jmask1, jnp.exp(s_q - m_past1[:, None]), 0.0)
        d_past1 = jnp.sum(w_past1, axis=1)
        n_past1 = jnp.einsum("bj,jbd->bd", w_past1, g_hist, precision=hi)
        if pmerge:
            n_past1 = jnp.matmul(n_past1, pW, precision=hi)

    def inner(icarry, ixs):
        if pmerge:
            q, e_prev, g_prev, gbuf, gbuf_proj, i = icarry
        else:
            q, e_prev, g_prev, gbuf, i = icarry
        deterministic = not training
        ks = (jax.random.split(ixs["key"], 4) if training else [None] * 4)

        g_, q0_sel = _drnn_pre(consts, ixs, q, g_prev, ks[0], dropout_rate,
                               deterministic)

        # within-chunk attention over gbuf rows < i (VMEM-sized)
        if context_attention == "simple":
            s_cur = jnp.einsum("jbd,dk->bj", gbuf, consts["attS"])
        else:
            s_cur = jnp.einsum("bd,jbd->bj", ixs["att_x"], gbuf)
        imask = jnp.arange(C)[None, :] < i
        s_cur = jnp.where(imask, s_cur, neg)
        m_cur = jnp.max(s_cur, axis=1)  # [B]
        w_cur = jnp.where(imask, jnp.exp(s_cur - m_cur[:, None]), 0.0)
        d_cur = jnp.sum(w_cur, axis=1)
        n_cur = jnp.einsum("bj,jbd->bd", w_cur,
                           gbuf_proj if pmerge else gbuf)

        # online-softmax merge of (past, current-chunk) partial sums
        if query_dep:
            m_p, d_p, n_p = ixs["m_past"], ixs["d_past"], ixs["n_past"]
            w_p = ixs["w_past"]
        else:
            m_p, d_p, n_p, w_p = m_past1, d_past1, n_past1, w_past1
        m = jnp.maximum(m_p, m_cur)
        sp = jnp.exp(m_p - m)
        sc = jnp.exp(m_cur - m)
        z = d_p * sp + d_cur * sc  # [B]; 0 iff empty prefix (t == 0)
        zinv = jnp.where(z > 0, 1.0 / jnp.where(z > 0, z, 1.0), 0.0)
        c_ = (n_p * sp[:, None] + n_cur * sc[:, None]) * zinv[:, None]

        # normalized alpha [B, L] (reference output; DCE'd when unused)
        if _SKIP_ALPHAS:  # measurement-only: bound the reconstruction cost
            alpha = jnp.zeros((B, L), dtype)
        else:
            a_past = w_p * (sp * zinv)[:, None]
            a_cur = w_cur * (sc * zinv)[:, None]
            alpha = a_past + jax.lax.dynamic_update_slice(
                jnp.zeros_like(a_past), a_cur,
                (jnp.asarray(0, t0.dtype), t0))

        gbuf = jax.lax.dynamic_update_slice_in_dim(gbuf, g_[None], i, axis=0)
        q_, e_ = _drnn_post(consts, ixs, q, e_prev, q0_sel, c_, ks,
                            listener_state, dropout_rate, deterministic,
                            c_projected=pmerge)
        if pmerge:
            # Project g_ for future steps' pooling — off the serial chain
            # (needed from the NEXT step on, so it overlaps the p/l/e
            # cells in this one).
            gbuf_proj = jax.lax.dynamic_update_slice_in_dim(
                gbuf_proj, jnp.matmul(g_, pW, precision=hi)[None], i, axis=0)
            return (q_, e_, g_, gbuf, gbuf_proj, i + 1), (e_, alpha)
        return (q_, e_, g_, gbuf, i + 1), (e_, alpha)

    inner_seqs = {k: v for k, v in xs.items()}
    if query_dep:
        inner_seqs.update(m_past=m_past, d_past=d_past, n_past=n_past,
                          w_past=w_past)
    gbuf0 = jnp.zeros((C, B, D_g), dtype)
    unroll = config.DRNN_UNROLL  # measurement-only floor ablation
    if pmerge:
        init_inner = (q0, e0, g0, gbuf0,
                      jnp.zeros((C, B, pW.shape[-1]), dtype),
                      jnp.asarray(0, t0.dtype))
        (q_, e_, g_, gbuf, _, _), (es, alphas) = jax.lax.scan(
            inner, init_inner, inner_seqs, unroll=unroll)
    else:
        (q_, e_, g_, gbuf, _), (es, alphas) = jax.lax.scan(
            inner, (q0, e0, g0, gbuf0, jnp.asarray(0, t0.dtype)), inner_seqs,
            unroll=unroll)
    g_hist = jax.lax.dynamic_update_slice_in_dim(g_hist, gbuf, t0, axis=0)
    return (q_, e_, g_, g_hist, t0 + C), (es, alphas)


def _fused_directions_chunked(cell_f, cell_b, inputs_f, inputs_b, chunk,
                              init, step_kwargs, deterministic, make_rng):
    """Both directions of the chunked DialogueRNN scan as ONE outer scan over
    chunks with a direction-vmapped chunk step (the chunked analogue of
    ``marn_variants._fused_directions``). Returns (ys_f, ys_b) per output."""
    import functools

    seqs_f, consts_f = cell_f(*inputs_f, deterministic, mode="gather")
    seqs_b, consts_b = cell_b(*inputs_b, deterministic, mode="gather")
    seqs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b], axis=1), seqs_f, seqs_b)
    consts = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), consts_f, consts_b)

    L = inputs_f[0].shape[0]
    training = not deterministic
    if training:
        seqs["key"] = jax.random.split(make_rng(), (L, 2))

    K = -(-L // chunk)
    L_pad = K * chunk
    if L_pad != L:  # zero-pad trailing steps; outputs truncated below
        seqs = jax.tree_util.tree_map(
            lambda a: jnp.pad(a, [(0, L_pad - L)] + [(0, 0)] * (a.ndim - 1)),
            seqs)
        # the history buffer must span the padded step count — the last
        # chunk's whole-chunk write would otherwise clamp its start index
        # and corrupt earlier rows. Padded rows are only ever written by
        # (and attended from) discarded trailing steps.
        q0, e0, g0, gh, t = init
        init = (q0, e0, g0,
                jnp.pad(gh, [(0, L_pad - L), (0, 0), (0, 0)]), t)
    seqs = jax.tree_util.tree_map(
        lambda a: a.reshape((K, chunk) + a.shape[1:]), seqs)

    init = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), init)
    fn = functools.partial(_drnn_chunk_step, training=training, **step_kwargs)

    def step(carry, xs):
        # consts/carry carry the direction on axis 0; per-chunk xs leaves
        # are [C, 2, ...] with the direction on axis 1.
        return jax.vmap(fn, in_axes=(0, 0, 1), out_axes=(0, 1))(
            consts, carry, xs)

    if training:
        from ser_tpu import config

        step = config.scan_remat(step)
    _, ys = jax.lax.scan(step, init, seqs)  # leaves [K, C, 2, ...]

    def split(y):
        flat = y.reshape((L_pad,) + y.shape[2:])[:L]
        return flat[:, 0], flat[:, 1]

    return tuple(split(y) for y in ys)


def matching_attention_general2(M, x, mask, transform_kernel, transform_bias):
    """Batched 'general2' MatchingAttention (ref ``DialogueRNN.py:60-66``):
    masked softmax then mask + renormalize, pooled over memory.

    M: [L, B, D]; x: [T, B, D] queries; mask: [B, L].
    Returns pooled [T, B, D] and alpha [T, B, L].
    """
    xt = jnp.matmul(x, transform_kernel) + transform_bias  # [T, B, D]
    scores = jnp.einsum("tbd,jbd->btj", xt, M)  # [B, T, L]
    alpha_ = jax.nn.softmax(scores * mask[:, None, :], axis=2)
    alpha_masked = alpha_ * mask[:, None, :]
    denom = jnp.sum(alpha_masked, axis=2, keepdims=True)
    # all-padded batch rows (full-batch padding) have denom 0; the reference
    # never sees such rows — clamp so they stay finite (they are masked out
    # of loss/metrics anyway, but NaN would poison the masked loss).
    alpha = alpha_masked / jnp.where(denom > 0, denom, 1.0)
    pooled = jnp.einsum("btj,jbd->tbd", alpha, M)
    return pooled, jnp.swapaxes(alpha, 0, 1)


class BiModel(nn.Module):
    """Bidirectional DialogueRNN (ref ``DialogueRNN.py:201-277``)."""

    D_m: int = 712
    D_g: int = 500
    D_p: int = 500
    D_e: int = 300
    D_h: int = 300
    n_classes: int = 7  # reference class defaults (DialogueRNN.py:203-205)
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, U, qmask, umask, att2: bool = True,
                 deterministic: bool = True):
        rnn_f = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_f")
        rnn_r = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_r")
        # self.dropout_rec = Dropout(dropout + 0.15) in the reference
        # (DialogueRNN.py:215) — applied to the emotion sequences.
        drop_rec = Dropout(self.dropout + 0.15, name="dropout_rec_mod")
        drop = Dropout(self.dropout, name="dropout_mod")

        # Both directions as ONE scan with a direction-vmapped step (the
        # directions share no state until the concat below). Scaffolding
        # shared with the MARN1 family: marn_variants._fused_directions.
        import functools

        from ser_tpu.models.marn_variants import _fused_directions

        rev_U = reverse_seq(U, umask)
        rev_qmask = reverse_seq(qmask, umask)
        L, B, P = U.shape[0], U.shape[1], qmask.shape[2]
        from ser_tpu import config

        chunk = config.drnn_chunk(L)
        init = _drnn_init(L, B, P, self.D_g, self.D_p, self.D_e, U.dtype)
        if chunk:
            (emotions_f, emotions_b), (alpha_f, alpha_b) = (
                _fused_directions_chunked(
                    rnn_f, rnn_r, (U, qmask), (rev_U, rev_qmask), chunk,
                    init, dict(listener_state=self.listener_state,
                               context_attention=self.context_attention,
                               dropout_rate=self.dropout_rec),
                    deterministic=deterministic,
                    make_rng=lambda: self.make_rng("dropout")))
            # padded-chunk alpha columns are identically zero for valid steps
            alpha_f = alpha_f[..., :L]
            alpha_b = alpha_b[..., :L]
        else:
            (emotions_f, emotions_b), (alpha_f, alpha_b) = _fused_directions(
                rnn_f, rnn_r, (U, qmask), (rev_U, rev_qmask),
                functools.partial(
                    _drnn_step, listener_state=self.listener_state,
                    context_attention=self.context_attention,
                    dropout_rate=self.dropout_rec),
                n_state=0, deterministic=deterministic,
                make_rng=lambda: self.make_rng("dropout"), qmask_idx=1,
                init=init)

        emotions_f = drop_rec(emotions_f, deterministic)
        emotions_b = reverse_seq(emotions_b, umask)
        emotions_b = drop_rec(emotions_b, deterministic)
        emotions = jnp.concatenate([emotions_f, emotions_b], axis=-1)

        if att2:
            tk, tb = declare_linear(self, "matchatt_transform",
                                    2 * self.D_e, 2 * self.D_e)
            att_emotions, alpha = matching_attention_general2(
                emotions, emotions, umask, tk, tb)
            hidden = nn.relu(TorchLinear(2 * self.D_h, name="linear")(
                att_emotions))
        else:
            alpha = None
            hidden = nn.relu(TorchLinear(2 * self.D_h, name="linear")(
                emotions))
        hidden = drop(hidden, deterministic)
        log_prob = jax.nn.log_softmax(
            TorchLinear(self.n_classes, name="smax_fc")(hidden), axis=2)
        return log_prob, alpha, alpha_f, alpha_b  # [L, B, C]


def register_dialogue_rnn(register, ModelSpec, trimodal_inputs):
    def extract(out):
        log_prob = out[0]  # [L, B, C]
        return jnp.swapaxes(log_prob, 0, 1).reshape(-1, log_prob.shape[-1])

    register(ModelSpec(
        name="DialogueRNN",
        build=lambda n_classes, dataset: BiModel(
            D_m=712, D_g=500, D_p=500, D_e=300, D_h=300,
            n_classes=6, listener_state=True, context_attention="general",
            dropout_rec=0.1, dropout=0.1),
        make_inputs=trimodal_inputs,
        extract_logp=extract))
