"""Experiment configuration (SURVEY §5.6).

The reference configures via 15 argparse flags with every model dimension
hard-coded in ``__init__`` bodies. Here the same flag surface is a dataclass
(CLI argparse in train.py maps 1:1 onto it), and per-model dimensions are
lifted into ``MODEL_DIMS`` so they are introspectable instead of buried in
literals.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

# ---------------------------------------------------------------------------
# Scan rematerialization policy for the training-mode recurrence step.
#
# With the fused rank-1 attention (ops/attention.py: no [B, H, H] tensor ever
# reaches HBM, and the attention op carries its own inner jax.checkpoint),
# the remat mode is a small effect; "full" is both fastest and the tightest
# memory bound (residuals are O(carry) per step).
# Measured (scripts/profile_train.py, v5e-1, MARN1_onlysp @ L=110 B=80):
#   full 22.7 ms/step | dots 23.3 | none 23.6
# (pre-fusion baseline was full 50.9 / dots 51.1 / none 40.4).
# ---------------------------------------------------------------------------
SCAN_REMAT = "full"  # "full" | "dots" | "none"

# ---------------------------------------------------------------------------
# DialogueRNN P==2 party-cell fast path: run p_cell/l_cell only on the rows
# the qmask mix keeps (B rows each) instead of all B*P rows. The halved
# matmul only buys time once B*P spills past one 128-row MXU tile; below
# that both shapes take the same MXU pass and the extra select ops lose.
# Measured (v5e-1, scripts/profile_drnn.py): eval B=31 generic wins
# (3.69 vs 3.96 ms); train B=80 fast wins (54.2 vs 60.5 ms, -10.5%).
#   "auto": engage when B * P > 128 | True / False: force (tests)
# ---------------------------------------------------------------------------
DRNN_FAST2 = "auto"

# ---------------------------------------------------------------------------
# DialogueRNN chunked flash-style context attention (models/dialogue_rnn.py::
# _drnn_chunk_step). The per-step scan reads the full [L, B, D_g] g_hist
# buffer twice every step — measured 60% of the eval pass / 29% of a train
# step (scripts/profile_drnn_att.py, v5e-1). Chunking the scan turns the
# completed-chunk contribution into two per-chunk matmuls over g_hist
# (traffic / C) merged with the within-chunk buffer by exact online-softmax.
# Balance point: past traffic ~ 2·L²·B·D/C falls with C, within-chunk
# ~ L·C·B·D grows with C -> C* ~ sqrt(2L) ~ 16 at L~110.
#   "auto": chunk of 16 once L >= 32 | int: force chunk size | None: per-step
# ---------------------------------------------------------------------------
DRNN_CHUNK = "auto"

# ---------------------------------------------------------------------------
# DialogueRNN p-cell projection fusion (chunked path only): the context
# vector c_ is used ONLY as p_in = p_x + c_ @ pWih_c, and both c_'s
# online-softmax merge and the projection are linear — so project the
# per-chunk past numerator and the within-chunk g rows through pWih_c OFF
# the critical path and merge already-projected terms in-step. Removes the
# [B, D_g] x [D_g, 3*D_p] matmul from the serial per-step chain, replacing
# it with a [B, C] x [C, B, 3*D_p] pooling (C/D_g ~ 1/30 of the MACs).
# Math is identical up to float reassociation (test_drnn_pmerge.py).
#   "auto": use the measured production default | True / False: force
# ---------------------------------------------------------------------------
DRNN_PMERGE = "auto"
_DRNN_PMERGE_AUTO = False  # flipped by the round-4 TPU A/B if it wins


def drnn_pmerge():
    """Static (trace-time) decision for the p-cell projection fusion."""
    if DRNN_PMERGE == "auto":
        return _DRNN_PMERGE_AUTO
    return bool(DRNN_PMERGE)


# Measurement-only: unroll factor for the DialogueRNN step scans (the
# floor-evidence ablation — if unrolling is neutral, per-step cost is not
# loop overhead). 1 in production: the flagship's identical ablation was
# neutral and a >1 default would only bloat compile time.
DRNN_UNROLL = 1


# ---------------------------------------------------------------------------
# Pluggable encoder self-attention (CLI --encoder_attention). The reference
# imports ExternalAttention into three model files (lsthm_sps.py:8,
# lsthm_onlysp.py:8, lsthm_nsps.py:8) but never instantiates it — a
# declared-but-dormant surface. Here the catalog is live: any name in
# ops.encoder_attention.SEQUENCE_KINDS swaps the EncoderLayer's multi-head
# self-attention for that catalog op (keeping the residual + dropout +
# LayerNorm epilogue). "mha" = the reference's own MultiHeadAttention.
# Set BEFORE building/initializing a model (it changes the param tree).
# ---------------------------------------------------------------------------
ENCODER_ATTENTION = "mha"

# ---------------------------------------------------------------------------
# Row-stacked bidirectional Pallas recurrence for the MARN1_onlysp EVAL path
# (ops/pallas/lsthm.py::lsthm_onlysp_recurrence_bidir_stacked): both
# directions ride the row axis of ONE kernel (block-diagonal weights, both
# modality LSTHM matmuls merged), so the whole 110-step recurrence is a
# single Pallas call with VMEM-resident carries instead of a lax.scan.
#   "off": always the scan | "on": force (TPU) | "interpret": force in
#   interpret mode (CPU tests) | "auto": engage on TPU when the shape gate
#   holds (P==2, H==128 all around, stacked rows 2*ceil8(B) <= 160 — the
#   kernel i-chunks its attention slab, so the bound is the staged inputs,
#   not the [R, IC, H] slab).
# Default pending the earn-or-retire measurement (scripts/
# bench_pallas_stacked.py); the retired d-loop kernel's history is in the
# ops/pallas/lsthm.py header.
# ---------------------------------------------------------------------------
ONLYSP_STACKED = "off"

# ---------------------------------------------------------------------------
# Pair-batched post-recurrence tail for the MARN1_onlysp / MARN1_sps heads
# (ops/attention.py::paired_attention_tail): the two structurally identical
# sequence-attention chains of the head ride a leading pair axis, so each
# stage is 4 batched einsums + one softmax instead of 8 small ops. Math is
# identical (the pair members never interact); at train time the attention-
# dropout RNG stream differs from the sequential form (one draw per stage
# over [2, B, L, L]) but is distributionally identical — the same contract
# as the fused-directions scan.
#   "auto": use the measured production default | True / False: force (tests)
# ---------------------------------------------------------------------------
TAIL_PAIRED = "auto"
_TAIL_PAIRED_AUTO = False  # flipped by the round-4 TPU A/B if it wins

# ---------------------------------------------------------------------------
# Modality-stacked recurrence steps for the variant cells whose per-step
# LSTHM chains are mutually independent WITHIN a step — sp
# (``lsthm_sp.py:82-160``), cf/azs (``lsthm_cf.py:103-204`` /
# ``lsthm_azs.py:74-154``) and newz (``lsthm_newz.py:60-110``). Stacking
# the independent chains on a leading modality axis makes each group ONE
# batched einsum + ONE gate pass (same math up to batched-matmul tiling;
# eval + grad exactness in tests/test_stack_modalities.py). In train mode
# the h-dropout mask is drawn once over the stacked [M, B, H] block — the
# same distributional-RNG contract as the fused-directions scan /
# TAIL_PAIRED.
#
# Round-5 A/B at the reference train shape [110, 80] (v5e-1, min-of-3
# fori_loop, scripts/bench_stack_modalities.py):
#   model   eval off->on        train off->on
#   newz    1.730 -> 1.496 ms   11.15 -> 7.72 ms   (1.16x / 1.45x)  WIN
#   sp      3.568 -> 3.922 ms   15.02 -> 15.70 ms  (0.91x / 0.96x)  lose
#   cf      3.560 -> 3.613 ms   16.30 -> 15.92 ms  (0.99x / 1.02x)  neutral
#   azs     3.751 -> 3.942 ms   17.78 -> 17.86 ms  (0.95x / 1.00x)  neutral
# newz wins because its step carried SEVEN separate per-step matmuls (3
# state-side per modality + attention projections) that fuse to four; the
# sp/cf/azs steps already fuse their state side into one concat-matmul per
# modality, and their per-step cost is B-linear activation/VPU work
# (scripts/profile_variant_bound.py), which stacking does not reduce —
# XLA already overlaps the independent chains (same finding as the r2
# pre-split-keys experiment). Hence per-family autos.
#   "auto": per-family measured default | True / False: force all (tests)
# ---------------------------------------------------------------------------
STACK_MODALITIES = "auto"
_STACK_MODALITIES_AUTO = {"newz": True, "sp": False, "cf": False}


def stack_modalities(family="sp"):
    """Static (trace-time) decision for the modality-stacked variant steps.

    ``family``: "newz" | "sp" | "cf" (cf covers azs — shared code path)."""
    if STACK_MODALITIES == "auto":
        return _STACK_MODALITIES_AUTO.get(family, False)
    return bool(STACK_MODALITIES)


# ---------------------------------------------------------------------------
# TRAIN-mode scan unroll for the variant recurrences (eval stays unroll=1 —
# unmeasured there, and the fast eval passes are gate-protected). The
# flagship's unroll ablation was neutral (dependency-bound), but the r5
# variant bound diagnosis (scripts/profile_variant_bound.py, v5e-1, quiet
# host, [110, 80]) found two real per-family wins:
#   la: u1 7.77 -> u4 5.18 ms (1.50x; u8 6.18 regresses; composes with
#       bf16: 5.13 -> 4.10 ms). la streams ~4.6 MB of weights per step
#       (its gate-LSTM + LSTHM kernels x 2 directions) against tiny
#       per-step compute; unrolling amortizes the weight traffic across
#       4 steps — consistent with its 2.07x bf16 speedup (halved bytes).
#   cf: u1 16.33 -> u2 14.29 ms (1.14x; u4 14.68 no better).
#   mf: u4 LOSES (6.29 -> 7.59 ms) — its weights are already amortized by
#       hoisted full-sequence projections; unroll just bloats the body.
#   sp: neutral (14.98 -> 14.98) — B-linear activation/VPU-bound.
# Per-family autos below; azs measured separately (shares cf's code path).
#   "auto": per-family measured default | int: force every family (tests)
# ---------------------------------------------------------------------------
SCAN_UNROLL = "auto"
_SCAN_UNROLL_AUTO = {"la": 4, "cf": 2}


def scan_unroll(family):
    """Static (trace-time) train-scan unroll factor for a variant family."""
    if SCAN_UNROLL == "auto":
        return _SCAN_UNROLL_AUTO.get(family, 1)
    return max(1, int(SCAN_UNROLL))


def tail_paired():
    """Static (trace-time) decision for the pair-batched head tail."""
    if TAIL_PAIRED == "auto":
        return _TAIL_PAIRED_AUTO
    return bool(TAIL_PAIRED)


def onlysp_stacked(B, P, dims_ok):
    """Static (trace-time) decision for the stacked eval kernel."""
    import jax

    if ONLYSP_STACKED == "off":
        return False
    if ONLYSP_STACKED in ("on", "interpret"):
        return P == 2 and dims_ok
    return (P == 2 and dims_ok and 2 * ((B + 7) // 8 * 8) <= 160
            and jax.default_backend() == "tpu")


def force_scan():
    """Context manager: trace with the scan recurrence regardless of
    ONLYSP_STACKED. For surfaces where the single-device Pallas kernel
    cannot lower — SPMD meshes (the partitioner cannot shard a
    pallas_call) and portable jax.export lowering. Wrap the TRACE (the
    first call of a jitted function), not just execution."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global ONLYSP_STACKED
        old = ONLYSP_STACKED
        ONLYSP_STACKED = "off"
        try:
            yield
        finally:
            ONLYSP_STACKED = old

    return _ctx()


def drnn_fast2(B, P):
    """Static (trace-time) decision for the DialogueRNN P==2 fast path."""
    if DRNN_FAST2 == "auto":
        return P == 2 and B * P > 128
    return bool(DRNN_FAST2) and P == 2


def drnn_chunk(L):
    """Static (trace-time) chunk size for DialogueRNN's context attention
    (None = per-step path)."""
    if DRNN_CHUNK == "auto":
        return 16 if L >= 32 else None
    if DRNN_CHUNK and L >= 2 * DRNN_CHUNK:
        return int(DRNN_CHUNK)
    return None


def scan_remat(step_fn):
    """Apply the configured remat policy to a scan step function."""
    import jax

    if SCAN_REMAT == "full":
        return jax.checkpoint(step_fn)
    if SCAN_REMAT == "dots":
        return jax.checkpoint(
            step_fn, policy=jax.checkpoint_policies.dots_saveable)
    return step_fn


@dataclass
class ExperimentConfig:
    # training (defaults = reference train.py:107-131)
    epoch: int = 80
    batch_size: int = 80
    num_workers: int = 2
    test_step: int = 1
    eval: bool = False
    initial_model: str = ""
    lr: float = 1e-3
    lr_decay: float = 0.98
    seed: int = 111
    loss: str = "CrossEntropy"  # CrossEntropy / NLL
    weight_decay: float = 2e-5

    # data / paths
    feature_path: str = "/home/workspaces/SMM22/features/"
    roberta_path: str | None = None
    dataset: str = "IEMOCAP"  # IEMOCAP / MELD
    save_path: str = "exps/MARN1_onlysp"
    synthetic: bool = False

    # model
    model: str = "MARN1_onlysp"
    n_classes: int = 6

    # parallelism
    dp: bool = False

    def to_dict(self):
        return asdict(self)


# Per-model dimension sheet (reference literals, lifted; see SURVEY §2.2).
MODEL_DIMS = {
    "MARN1_onlysp": dict(d_r=1024, d_l=100, d_a=100, dh_l=128, dh_a=128,
                         dh_s=128, h_out=32, enc_d_inner=40, enc_heads=8,
                         enc_dk=40, dropout=0.5, attn_dropout=0.2),
    "MARN1_sps": dict(d_r=1024, d_l=100, d_a=100, dh=128, h_out=32,
                      enc_d_inner=40, residual_encoder=True),
    "MARN1_nsps": dict(d_r=1024, d_l=100, d_a=100, dh=128, h_out=32,
                       fusion="softmax_p2", residual_head=True),
    "MARN1_no_en": dict(like="MARN1_nsps", text_encoder=False),
    "MARN1_sp": dict(d_l=100, d_a=100, dh=128, speaker="lsthm_q"),
    "MARN1_cf": dict(d_l=100, d_a=100, dh=128, speaker="lstm_shared",
                     head_attn="one_way"),
    "MARN1_mf": dict(d_l=100, d_a=100, dh=128, z="memory_forget_gate",
                     enc_d_inner=50),
    "MARN1_la": dict(d_l=100, d_a=100, dh=128, z=None, input_gate="aux_lstm"),
    "MARN1_azs": dict(d_l=100, d_a=100, dh=128, head_attn=None),
    "MARN1_newz": dict(d_l=100, d_a=100, dh=128, z="multi_att_ema",
                       speaker_dim=512, num_atts=4),
    "BiLSTM": dict(d_l=100, d_a=100, dh_l=128, dh_a=16, h_out=32,
                   enc_d_inner=50),
    "MARN": dict(d_l=100, d_a=100, dh_l=128, dh_a=16, degenerate=True),
    "MARN_AT": dict(d_l=100, d_a=100, dh_l=128, dh_a=16, n_classes=7,
                    num_atts=4),
    "MARN_ATV": dict(d_l=100, d_a=100, d_v=512, dh_l=128, dh_a=16, dh_v=64,
                     num_atts=4),
    "DialogueRNN": dict(D_m=712, D_g=500, D_p=500, D_e=300, D_h=300,
                        listener_state=True, context_attention="general",
                        dropout_rec=0.1, dropout=0.1),
}
