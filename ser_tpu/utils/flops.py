"""Analytic FLOP counts for benched computations (efficiency tracking).

The reference has no efficiency story; PERF.md's roofline was hand
arithmetic. Here the per-pass FLOP count comes from XLA's own cost
analysis of the lowered module, so `bench.py` / `bench_zoo.py` can emit
effective TFLOP/s (+ % of peak) next to utts/s and MFU drift becomes
diffable across rounds (VERDICT r3 item 6).

Numbers are from the UNOPTIMIZED lowered HLO (`Lowered.cost_analysis()`),
which needs no backend compile — important on the axon relay where an
extra compile can cost minutes. Unoptimized counts can slightly overstate
what fused/optimized code executes, but they are deterministic for a given
(model, shape) and that is what a round-over-round diff needs.
"""

from __future__ import annotations

# v5e MXU peaks (per chip): 197 TFLOP/s bf16; f32 matmuls run the MXU in
# passes at roughly half that. PERF.md's roofline ("~5.5 TFLOP/s = ~6% of
# f32 matmul peak") uses the same figure.
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_F32_PEAK_TFLOPS = 98.5


def jit_flops(fn, *args, static_argnums=(), allow_compile=False):
    """FLOPs of one call of ``fn(*args)`` per XLA cost analysis.

    Returns ``float`` or ``None`` when the backend's analysis is
    unavailable (never raises — efficiency reporting must not break the
    benchmark). The ``lowered.compile()`` fallback is OPT-IN
    (``allow_compile=True``): on the axon relay a fresh backend compile
    can silently take minutes, and bench loops must stay compile-free."""
    import jax

    try:
        lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args)
        ca = lowered.cost_analysis()
        if ca and ca.get("flops"):
            return float(ca["flops"])
        if allow_compile:
            ca = lowered.compile().cost_analysis()
            if ca and ca.get("flops"):
                return float(ca["flops"])
    except Exception:
        pass
    return None


def efficiency(flops, seconds, peak_tflops=V5E_F32_PEAK_TFLOPS):
    """{tflops_effective, pct_peak} for one pass, or {} if unknown."""
    if not flops or not seconds or seconds <= 0:
        return {}
    tf = flops / seconds / 1e12
    return {
        "flops_per_pass": flops,
        "tflops_effective": round(tf, 3),
        "pct_f32_peak": round(100.0 * tf / peak_tflops, 2),
    }
