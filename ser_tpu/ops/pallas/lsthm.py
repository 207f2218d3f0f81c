"""Fused LSTHM dialogue-recurrence kernel (onlysp cell, eval path).

The lax.scan formulation pays per-step while-loop overhead and HBM round
trips for six [B, 128] carries at every utterance step — dominating eval
latency since the per-step math is tiny (~12 MFLOP). This kernel runs the
ENTIRE recurrence as one Pallas call: grid=(T,) executes sequentially on
TPU, so the carries (h/c per modality, fusion state z, per-party speaker
memory q) live in VMEM scratch across all steps; per-step inputs stream in
as [1, B, .] blocks and only the per-step output leaves the chip.

Covers the deterministic (eval/serving) path of
``ser_tpu.models.marn_onlysp.MARNCellOnlySP`` — training keeps the scan
(dropout needs per-step RNG). Validated against the scan path in tests
(interpret mode on CPU, compiled on TPU).

MEASURED RESULT — round-2 earn-or-retire matrix (v5e-1, T=110, f32; after
the fused rank-1 attention landed in the XLA path too):

  single direction, B=31:  pallas 0.66 ms  vs  lax.scan 0.82 ms  (1.23x WIN)
  single direction, K=8 step unroll: 0.90 ms (unroll amortizes nothing —
      per-grid-step overhead is already small; register/VMEM pressure wins)
  BIDIRECTIONAL (production path = one direction-vmapped scan):
      B=31: pallas bidir 1.59 ms vs fused scan 1.52 ms (XLA wins)
      B=80: pallas bidir 4.00 ms vs fused scan 3.29 ms (XLA wins)
  B=256: Mosaic stages the full [T, B, 4H] inputs on the VMEM stack and
      OOMs (35.9 MB > 16 MB) — this design does not scale batch up.

(The round-1 "30x slower" measurement does not reproduce on the current
toolchain; treat it as stale.) Verdict: the production eval path stays on
the direction-fused XLA scan — it beats the best kernel variant on the
shapes that matter and has no VMEM ceiling. The kernel remains OPT-IN
(``MARNCellOnlySP(pallas='on')``, single-direction only) as validated
infrastructure and the only configuration where Pallas wins (unfused
single-direction eval).

ROUND-3 earn-or-retire matrix for the ROW-STACKED bidirectional variant
(``lsthm_onlysp_recurrence_bidir_stacked``; both directions folded onto
the row axis of ONE kernel, vertically-stacked per-direction weights,
merged modality matmuls, i-chunked attention slab). Measured v5e-1,
T=110, f32 (scripts/bench_pallas_stacked.py, 2026-08-18):

  B=31:  stacked 1.63 ms  vs  fused scan 1.30 ms  (scan wins 1.25x);
         direction-loop variant 1.67 ms; maxerr vs scan 2.0e-4.
  B=80:  stacked FAILS to compile on real TPU (remote tpu_compile_helper
         exit 1 — the R=160-row staged inputs + [R, IC, H] attention slab
         exceed what Mosaic can place; interpret-mode parity still passes);
         direction-loop 3.96 ms vs scan 3.02 ms.

Verdict: RETIRED from the default path like its siblings —
``config.ONLYSP_STACKED`` stays "off" (opt-in, parity-pinned in
tests/test_pallas_lsthm.py). The stacking eliminated the vmap'd kernel
launch and the zero-block FLOPs, but the per-grid-step DMA/scheduling
overhead Mosaic pays per utterance step still exceeds what the XLA scan
pays per step, and VMEM staging caps batch far below production shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _kernel(xl_ref, xa_ref, gx_ref, oh_ref, qm_ref,
            Kl_ref, bl_ref, Ka_ref, ba_ref, gWhh_ref, gbhh_ref,
            wq_ref, wk_ref,
            out_ref,
            hl_s, cl_s, ha_s, ca_s, z_s, q0_s, q1_s,
            *, H: int, Hs: int, unroll: int = 1):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        hl_s[:, :] = jnp.zeros_like(hl_s)
        cl_s[:, :] = jnp.zeros_like(cl_s)
        ha_s[:, :] = jnp.zeros_like(ha_s)
        ca_s[:, :] = jnp.zeros_like(ca_s)
        z_s[:, :] = jnp.zeros_like(z_s)
        q0_s[:, :] = jnp.zeros_like(q0_s)
        q1_s[:, :] = jnp.zeros_like(q1_s)

    # K steps per grid invocation (static unroll) amortize Mosaic's
    # per-grid-step scheduling/DMA overhead across `unroll` utterances.
    for k in range(unroll):
        oh = oh_ref[k]  # [B, 2] argmax-derived one-hot
        qm = qm_ref[k]  # [B, 2] raw qmask
        q0 = q0_s[:, :]
        q1 = q1_s[:, :]
        qs0 = q0 * oh[:, 0:1] + q1 * oh[:, 1:2]

        # GRU speaker update (x side precomputed)
        hproj = jnp.dot(qs0, gWhh_ref[:, :],
                        preferred_element_type=jnp.float32) + gbhh_ref[0]
        xg = gx_ref[k]
        r = _sigmoid(xg[:, :Hs] + hproj[:, :Hs])
        zg = _sigmoid(xg[:, Hs:2 * Hs] + hproj[:, Hs:2 * Hs])
        n = jnp.tanh(xg[:, 2 * Hs:] + r * hproj[:, 2 * Hs:])
        h_s = (1.0 - zg) * n + zg * qs0

        # masked scatter into party memory
        q0_s[:, :] = q0 * (1.0 - qm[:, 0:1]) + h_s * qm[:, 0:1]
        q1_s[:, :] = q1 * (1.0 - qm[:, 1:2]) + h_s * qm[:, 1:2]

        z = z_s[:, :]

        # text LSTHM (fused [h|z|s] @ K_l)
        state_l = jnp.concatenate([hl_s[:, :], z, h_s], axis=-1)
        sums_l = xl_ref[k] + jnp.dot(
            state_l, Kl_ref[:, :],
            preferred_element_type=jnp.float32) + bl_ref[0]
        c_l = _sigmoid(sums_l[:, :H]) * cl_s[:, :] + \
            _sigmoid(sums_l[:, H:2 * H]) * jnp.tanh(sums_l[:, 3 * H:])
        h_l = jnp.tanh(c_l) * _sigmoid(sums_l[:, 2 * H:3 * H])

        # audio LSTHM
        state_a = jnp.concatenate([ha_s[:, :], z, h_s], axis=-1)
        sums_a = xa_ref[k] + jnp.dot(
            state_a, Ka_ref[:, :],
            preferred_element_type=jnp.float32) + ba_ref[0]
        c_a = _sigmoid(sums_a[:, :H]) * ca_s[:, :] + \
            _sigmoid(sums_a[:, H:2 * H]) * jnp.tanh(sums_a[:, 3 * H:])
        h_a = jnp.tanh(c_a) * _sigmoid(sums_a[:, 2 * H:3 * H])

        # fused rank-1 cross attention: logits[b,i,j] = alpha[b,i]*wk[j];
        # exact row max in O(B*H) via the rank-1 structure (matches
        # ops/attention.py)
        wk = wk_ref[0]
        s = jnp.sum(c_a * wq_ref[0][None, :], axis=-1,
                    keepdims=True) / (H ** 0.5)
        alpha = c_l * s  # [B, H]
        m = jnp.where(alpha > 0, alpha * jnp.max(wk), alpha * jnp.min(wk))
        e = jnp.exp(alpha[:, :, None] * wk[None, None, :] - m[:, :, None])
        z_new = jnp.sum(e * c_a[:, None, :], axis=-1) / jnp.sum(e, axis=-1)

        hl_s[:, :] = h_l
        cl_s[:, :] = c_l
        ha_s[:, :] = h_a
        ca_s[:, :] = c_a
        z_s[:, :] = z_new

        out_ref[k] = jnp.concatenate([h_l, h_a, z_new, h_s], axis=-1)


def lsthm_onlysp_recurrence(xl_proj, xa_proj, gru_x, qmask,
                            K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk,
                            interpret: bool = False, unroll: int = 1):
    """Run the full onlysp forward recurrence as one fused kernel.

    Args (shapes; H=Hl=Ha=Hs=128):
      xl_proj, xa_proj: [T, B, 4H]; gru_x: [T, B, 3H]; qmask: [T, B, 2].
      K_l/K_a: [3H, 4H]; b_l/b_a: [4H]; gWhh: [H, 3H]; gbhh: [3H];
      wq/wk: [H].

    Returns [T, B, 4H] per-step outputs [h_l|h_a|z|h_s].

    B is padded to a multiple of 8 internally (TPU sublane tiling).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B = xl_proj.shape[0], xl_proj.shape[1]
    H = K_l.shape[1] // 4
    Hs = gWhh.shape[0]
    P = qmask.shape[2]
    assert P == 2, "fused kernel supports 2 parties (IEMOCAP)"

    Bp = ((B + 7) // 8) * 8
    if Bp != B:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((T, Bp - B) + x.shape[2:], x.dtype)], axis=1)
        xl_proj, xa_proj, gru_x, qmask = map(
            pad, (xl_proj, xa_proj, gru_x, qmask))

    K = max(1, unroll)
    Tp = ((T + K - 1) // K) * K
    if Tp != T:
        padt = lambda x: jnp.concatenate(
            [x, jnp.zeros((Tp - T,) + x.shape[1:], x.dtype)], axis=0)
        xl_proj, xa_proj, gru_x, qmask = map(
            padt, (xl_proj, xa_proj, gru_x, qmask))

    idx = jnp.argmax(qmask, axis=2)
    onehot = jax.nn.one_hot(idx, P, dtype=xl_proj.dtype)  # [Tp, Bp, 2]

    kernel = functools.partial(_kernel, H=H, Hs=Hs, unroll=K)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, 4 * H), jnp.float32),
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, Bp, 4 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((K, Bp, 4 * H), lambda t: (t, 0, 0)),
            pl.BlockSpec((K, Bp, 3 * Hs), lambda t: (t, 0, 0)),
            pl.BlockSpec((K, Bp, P), lambda t: (t, 0, 0)),
            pl.BlockSpec((K, Bp, P), lambda t: (t, 0, 0)),
            pl.BlockSpec(K_l.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0)),
            pl.BlockSpec(K_a.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0)),
            pl.BlockSpec(gWhh.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, 3 * Hs), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, Bp, 4 * H), lambda t: (t, 0, 0)),
        scratch_shapes=[
            # carries live in VMEM across the sequential grid:
            # h_l, c_l, h_a, c_a, z, q_party0, q_party1
            pltpu.VMEM((Bp, H), jnp.float32)
            for _ in range(7)
        ],
        interpret=interpret,
    )(xl_proj, xa_proj, gru_x, onehot, qmask,
      K_l, b_l.reshape(1, -1), K_a, b_a.reshape(1, -1),
      gWhh, gbhh.reshape(1, -1), wq.reshape(1, -1), wk.reshape(1, -1))
    return out[:T, :B]


def _kernel_bidir(xl_ref, xa_ref, gx_ref, oh_ref, qm_ref,
                  Kl_ref, bl_ref, Ka_ref, ba_ref, gWhh_ref, gbhh_ref,
                  wq_ref, wk_ref,
                  out_ref,
                  hl_s, cl_s, ha_s, ca_s, z_s, q0_s, q1_s,
                  *, H: int, Hs: int):
    """Both recurrence directions in one kernel step: the two chains are
    independent, so Mosaic overlaps dir-0's MXU matmuls with dir-1's VPU
    work. Refs carry a leading direction axis of 2; scratch is [2, B, H]."""
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for s in (hl_s, cl_s, ha_s, ca_s, z_s, q0_s, q1_s):
            s[:, :, :] = jnp.zeros_like(s)

    for d in range(2):
        oh = oh_ref[0, d]
        qm = qm_ref[0, d]
        q0 = q0_s[d]
        q1 = q1_s[d]
        qs0 = q0 * oh[:, 0:1] + q1 * oh[:, 1:2]

        hproj = jnp.dot(qs0, gWhh_ref[d],
                        preferred_element_type=jnp.float32) + gbhh_ref[d]
        xg = gx_ref[0, d]
        r = _sigmoid(xg[:, :Hs] + hproj[:, :Hs])
        zg = _sigmoid(xg[:, Hs:2 * Hs] + hproj[:, Hs:2 * Hs])
        n = jnp.tanh(xg[:, 2 * Hs:] + r * hproj[:, 2 * Hs:])
        h_s = (1.0 - zg) * n + zg * qs0

        q0_s[d] = q0 * (1.0 - qm[:, 0:1]) + h_s * qm[:, 0:1]
        q1_s[d] = q1 * (1.0 - qm[:, 1:2]) + h_s * qm[:, 1:2]

        z = z_s[d]
        state_l = jnp.concatenate([hl_s[d], z, h_s], axis=-1)
        sums_l = xl_ref[0, d] + jnp.dot(
            state_l, Kl_ref[d],
            preferred_element_type=jnp.float32) + bl_ref[d]
        c_l = _sigmoid(sums_l[:, :H]) * cl_s[d] + \
            _sigmoid(sums_l[:, H:2 * H]) * jnp.tanh(sums_l[:, 3 * H:])
        h_l = jnp.tanh(c_l) * _sigmoid(sums_l[:, 2 * H:3 * H])

        state_a = jnp.concatenate([ha_s[d], z, h_s], axis=-1)
        sums_a = xa_ref[0, d] + jnp.dot(
            state_a, Ka_ref[d],
            preferred_element_type=jnp.float32) + ba_ref[d]
        c_a = _sigmoid(sums_a[:, :H]) * ca_s[d] + \
            _sigmoid(sums_a[:, H:2 * H]) * jnp.tanh(sums_a[:, 3 * H:])
        h_a = jnp.tanh(c_a) * _sigmoid(sums_a[:, 2 * H:3 * H])

        wk = wk_ref[d]
        s = jnp.sum(c_a * wq_ref[d][None, :], axis=-1,
                    keepdims=True) / (H ** 0.5)
        alpha = c_l * s
        m = jnp.where(alpha > 0, alpha * jnp.max(wk), alpha * jnp.min(wk))
        e = jnp.exp(alpha[:, :, None] * wk[None, None, :] - m[:, :, None])
        z_new = jnp.sum(e * c_a[:, None, :], axis=-1) / jnp.sum(e, axis=-1)

        hl_s[d] = h_l
        cl_s[d] = c_l
        ha_s[d] = h_a
        ca_s[d] = c_a
        z_s[d] = z_new

        out_ref[0, d] = jnp.concatenate([h_l, h_a, z_new, h_s], axis=-1)


def lsthm_onlysp_recurrence_bidir(seqs, consts, interpret: bool = False):
    """Fused BIDIRECTIONAL onlysp recurrence.

    Drop-in replacement for the direction-vmapped ``lax.scan`` in
    ``MARN1OnlySP``'s fused eval path (same math as ``_eval_step``):

      seqs:   (xl_proj, xa_proj, gru_x, qmask), each [T, 2, B, .]
      consts: (K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk), each [2, ...]

    Returns [T, 2, B, 4H] per-step outputs [h_l|h_a|z|h_s].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xl_proj, xa_proj, gru_x, qmask = seqs
    K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk = consts
    T, _, B = xl_proj.shape[:3]
    H = K_l.shape[2] // 4
    Hs = gWhh.shape[1]
    P = qmask.shape[3]
    assert P == 2, "fused kernel supports 2 parties (IEMOCAP)"

    Bp = ((B + 7) // 8) * 8
    if Bp != B:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:2] + (Bp - B,) + x.shape[3:], x.dtype)],
            axis=2)
        xl_proj, xa_proj, gru_x, qmask = map(
            pad, (xl_proj, xa_proj, gru_x, qmask))

    idx = jnp.argmax(qmask, axis=3)
    onehot = jax.nn.one_hot(idx, P, dtype=xl_proj.dtype)  # [T, 2, Bp, 2]

    kernel = functools.partial(_kernel_bidir, H=H, Hs=Hs)
    step_specs = [
        pl.BlockSpec((1, 2, Bp, 4 * H), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((1, 2, Bp, 4 * H), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((1, 2, Bp, 3 * Hs), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((1, 2, Bp, P), lambda t: (t, 0, 0, 0)),
        pl.BlockSpec((1, 2, Bp, P), lambda t: (t, 0, 0, 0)),
    ]
    const_specs = [
        pl.BlockSpec(K_l.shape, lambda t: (0, 0, 0)),
        pl.BlockSpec(b_l.shape, lambda t: (0, 0)),
        pl.BlockSpec(K_a.shape, lambda t: (0, 0, 0)),
        pl.BlockSpec(b_a.shape, lambda t: (0, 0)),
        pl.BlockSpec(gWhh.shape, lambda t: (0, 0, 0)),
        pl.BlockSpec(gbhh.shape, lambda t: (0, 0)),
        pl.BlockSpec(wq.shape, lambda t: (0, 0)),
        pl.BlockSpec(wk.shape, lambda t: (0, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, 2, Bp, 4 * H), jnp.float32),
        grid=(T,),
        in_specs=step_specs + const_specs,
        out_specs=pl.BlockSpec((1, 2, Bp, 4 * H), lambda t: (t, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Bp, H), jnp.float32) for _ in range(7)
        ],
        interpret=interpret,
    )(xl_proj, xa_proj, gru_x, onehot, qmask,
      K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk)
    return out[:, :, :B]


def _kernel_bidir_stacked(xl_ref, xa_ref, gx_ref, oh_ref, qm_ref,
                          G_ref, gb_ref, K_ref, b_ref,
                          wq_ref, wk_ref, wkmm_ref, m0_ref,
                          out_ref,
                          hl_s, cl_s, ha_s, ca_s, z_s, q0_s, q1_s,
                          *, H: int, IC: int):
    """Row-stacked bidirectional step: both directions ride the ROW axis
    (rows [0:Bp] = forward, [Bp:2Bp] = backward), so every VPU op runs ONCE
    on [R, .] instead of twice on [B, .] (the ``_kernel_bidir`` d-loop
    measured ~2x the single-direction kernel — Mosaic does not interleave
    the two chains).

    Per-direction weights need no select: the input is laid out as
    [state*m0 | state*(1-m0)] and the weights VERTICALLY stacked
    [K_fwd; K_bwd], so forward rows hit K_fwd and backward rows K_bwd in
    one matmul whose output is already per-row correct. The two modality
    LSTHM matmuls are additionally merged (shared [h_l|h_a|z|h_s] input).

    Row-wise constants (biases, wq/wk, the rank-1 max/min of wk, the
    forward-row mask m0) are precomputed outside as [R, .] arrays.

    ``IC``: attention i-chunk — the [R, IC, H] slab is the kernel's VMEM
    peak; IC < H trades a few extra VPU passes for fitting larger R.
    """
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for s in (hl_s, cl_s, ha_s, ca_s, z_s, q0_s, q1_s):
            s[:, :] = jnp.zeros_like(s)

    m0 = m0_ref[:, :]  # [R, 1] 1.0 on forward rows
    oh = oh_ref[0]
    qm = qm_ref[0]
    q0 = q0_s[:, :]
    q1 = q1_s[:, :]
    qs0 = q0 * oh[:, 0:1] + q1 * oh[:, 1:2]

    # GRU speaker update ([qs0*m0 | qs0*(1-m0)] @ [G_fwd; G_bwd])
    qs0_pad = jnp.concatenate([qs0 * m0, qs0 * (1.0 - m0)], axis=-1)
    hproj = jnp.dot(qs0_pad, G_ref[:, :],
                    preferred_element_type=jnp.float32) + gb_ref[:, :]
    xg = gx_ref[0]
    r = _sigmoid(xg[:, :H] + hproj[:, :H])
    zg = _sigmoid(xg[:, H:2 * H] + hproj[:, H:2 * H])
    n = jnp.tanh(xg[:, 2 * H:] + r * hproj[:, 2 * H:])
    h_s = (1.0 - zg) * n + zg * qs0

    q0_s[:, :] = q0 * (1.0 - qm[:, 0:1]) + h_s * qm[:, 0:1]
    q1_s[:, :] = q1 * (1.0 - qm[:, 1:2]) + h_s * qm[:, 1:2]

    # Both modality LSTHMs in one matmul on [h_l|h_a|z|h_s].
    z = z_s[:, :]
    state = jnp.concatenate([hl_s[:, :], ha_s[:, :], z, h_s], axis=-1)
    state_pad = jnp.concatenate([state * m0, state * (1.0 - m0)], axis=-1)
    sums = jnp.dot(state_pad, K_ref[:, :],
                   preferred_element_type=jnp.float32) + b_ref[:, :]
    sums_l = xl_ref[0] + sums[:, :4 * H]
    sums_a = xa_ref[0] + sums[:, 4 * H:]

    c_l = _sigmoid(sums_l[:, :H]) * cl_s[:, :] + \
        _sigmoid(sums_l[:, H:2 * H]) * jnp.tanh(sums_l[:, 3 * H:])
    h_l = jnp.tanh(c_l) * _sigmoid(sums_l[:, 2 * H:3 * H])
    c_a = _sigmoid(sums_a[:, :H]) * ca_s[:, :] + \
        _sigmoid(sums_a[:, H:2 * H]) * jnp.tanh(sums_a[:, 3 * H:])
    h_a = jnp.tanh(c_a) * _sigmoid(sums_a[:, 2 * H:3 * H])

    # fused rank-1 cross attention, row-wise wq/wk (wkmm = [max|min](wk)),
    # i-chunked to bound the [R, IC, H] VMEM slab.
    wq = wq_ref[:, :]
    wk = wk_ref[:, :]
    s = jnp.sum(c_a * wq, axis=-1, keepdims=True) / (H ** 0.5)
    alpha = c_l * s
    m = jnp.where(alpha > 0, alpha * wkmm_ref[:, 0:1],
                  alpha * wkmm_ref[:, 1:2])
    chunks = []
    for i0 in range(0, H, IC):
        a_c = alpha[:, i0:i0 + IC]
        m_c = m[:, i0:i0 + IC]
        e = jnp.exp(a_c[:, :, None] * wk[:, None, :] - m_c[:, :, None])
        chunks.append(jnp.sum(e * c_a[:, None, :], axis=-1)
                      / jnp.sum(e, axis=-1))
    z_new = chunks[0] if len(chunks) == 1 else jnp.concatenate(
        chunks, axis=-1)

    hl_s[:, :] = h_l
    cl_s[:, :] = c_l
    ha_s[:, :] = h_a
    ca_s[:, :] = c_a
    z_s[:, :] = z_new

    out_ref[0] = jnp.concatenate([h_l, h_a, z_new, h_s], axis=-1)


def lsthm_onlysp_recurrence_bidir_stacked(seqs, consts,
                                          interpret: bool = False):
    """Row-stacked fused BIDIRECTIONAL onlysp recurrence.

    Same contract as ``lsthm_onlysp_recurrence_bidir``:

      seqs:   (xl_proj, xa_proj, gru_x, qmask), each [T, 2, B, .]
      consts: (K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk), each [2, ...]

    Returns [T, 2, B, 4H] per-step outputs [h_l|h_a|z|h_s].

    B pads to a sublane multiple per direction, then the direction axis
    folds into rows: [T, 2, Bp, .] -> [T, 2Bp, .] with rows [0:Bp] forward.
    VMEM bound: the attention slab is [2Bp, IC, H] f32; IC shrinks
    automatically for larger R (callers should still gate on 2Bp <= ~160
    at H=128 — beyond that the staged inputs themselves crowd VMEM).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xl_proj, xa_proj, gru_x, qmask = seqs
    K_l, b_l, K_a, b_a, gWhh, gbhh, wq, wk = consts
    T, _, B = xl_proj.shape[:3]
    H = K_l.shape[2] // 4
    Hs = gWhh.shape[1]
    P = qmask.shape[3]
    assert P == 2, "fused kernel supports 2 parties (IEMOCAP)"
    assert Hs == H, "stacked kernel assumes Hl == Ha == Hs"

    Bp = ((B + 7) // 8) * 8
    if Bp != B:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:2] + (Bp - B,) + x.shape[3:], x.dtype)],
            axis=2)
        xl_proj, xa_proj, gru_x, qmask = map(
            pad, (xl_proj, xa_proj, gru_x, qmask))
    R = 2 * Bp

    idx = jnp.argmax(qmask, axis=3)
    onehot = jax.nn.one_hot(idx, P, dtype=xl_proj.dtype)

    fold = lambda x: x.reshape((T, R) + x.shape[3:])
    xl_r, xa_r, gx_r, oh_r, qm_r = map(
        fold, (xl_proj, xa_proj, gru_x, onehot, qmask))

    # Vertically stacked per-direction weights: input rows are laid out
    # [x*m0 | x*(1-m0)], so forward rows hit the top block and backward
    # rows the bottom block — no output select, no zero-block FLOPs beyond
    # the modality merge.
    G = jnp.concatenate([gWhh[0], gWhh[1]], axis=0)  # [2H, 3H]

    def _k_comb(d):
        # [4H, 8H]: rows (h_l, h_a, z, h_s) -> cols (sums_l | sums_a);
        # K_l/K_a store rows in (h, z, s) order (concat in the cell).
        zH = jnp.zeros((H, 4 * H), jnp.float32)
        left = jnp.concatenate(
            [K_l[d, :H], zH, K_l[d, H:2 * H], K_l[d, 2 * H:]], axis=0)
        right = jnp.concatenate(
            [zH, K_a[d, :H], K_a[d, H:2 * H], K_a[d, 2 * H:]], axis=0)
        return jnp.concatenate([left, right], axis=1)

    K = jnp.concatenate([_k_comb(0), _k_comb(1)], axis=0)  # [8H, 8H]

    m0 = (jnp.arange(R) < Bp).astype(jnp.float32)[:, None]
    rsel = lambda c: jnp.where(m0 > 0, c[0][None, :], c[1][None, :])
    gb_rows = rsel(gbhh)                                    # [R, 3H]
    b_rows = rsel(jnp.concatenate([b_l, b_a], axis=1))      # [R, 8H]
    wq_rows = rsel(wq)                                      # [R, H]
    wk_rows = rsel(wk)
    wkmm = jnp.concatenate(
        [rsel(jnp.max(wk, axis=1, keepdims=True)),
         rsel(jnp.min(wk, axis=1, keepdims=True))], axis=1)  # [R, 2]

    # attention i-chunk: keep the [R, IC, H] slab under ~4.5 MB f32
    # (R=64 — the bench eval shape — stays a single block; R=112 chunks
    # to 64; R=160 to 32)
    IC = H
    while R * IC * H * 4 > int(4.5 * 2 ** 20) and IC > 32:
        IC //= 2
    kernel = functools.partial(_kernel_bidir_stacked, H=H, IC=IC)
    step_specs = [
        pl.BlockSpec((1, R, 4 * H), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, R, 4 * H), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, R, 3 * H), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, R, P), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, R, P), lambda t: (t, 0, 0)),
    ]
    const_specs = [
        pl.BlockSpec(G.shape, lambda t: (0, 0)),
        pl.BlockSpec(gb_rows.shape, lambda t: (0, 0)),
        pl.BlockSpec(K.shape, lambda t: (0, 0)),
        pl.BlockSpec(b_rows.shape, lambda t: (0, 0)),
        pl.BlockSpec(wq_rows.shape, lambda t: (0, 0)),
        pl.BlockSpec(wk_rows.shape, lambda t: (0, 0)),
        pl.BlockSpec(wkmm.shape, lambda t: (0, 0)),
        pl.BlockSpec(m0.shape, lambda t: (0, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, R, 4 * H), jnp.float32),
        grid=(T,),
        in_specs=step_specs + const_specs,
        out_specs=pl.BlockSpec((1, R, 4 * H), lambda t: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, H), jnp.float32) for _ in range(7)
        ],
        interpret=interpret,
    )(xl_r, xa_r, gx_r, oh_r, qm_r,
      G, gb_rows, K, b_rows, wq_rows, wk_rows, wkmm, m0)
    return out.reshape(T, 2, Bp, 4 * H)[:, :, :B]
