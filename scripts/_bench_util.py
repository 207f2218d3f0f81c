"""Shared timing methodology for the scripts/ benchmarks (see CLAUDE.md).

On the axon relay ``block_until_ready`` is a no-op and per-call dispatch
noise dominates sub-ms kernels, so every measurement chains K passes
on-device (``lax.fori_loop`` with a tiny data dependency) and fetches one
scalar; per-pass = (t_K - t_1) / (K - 1), min over ``repeats`` runs. The
k=1 warmup call compiles BOTH static iteration counts before anything is
timed (the retrace-in-timed-region trap).

bench.py at the repo root keeps its own copy: the driver runs it
standalone and it must not depend on scripts/ being importable.
"""

from __future__ import annotations

import time


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def per_pass_seconds(loop_fn, iters=31, repeats=3, min_window_s=0.15,
                     max_iters=5000):
    """loop_fn(n) must run n chained passes on device and return a scalar.

    The iteration count auto-scales so the timed window is at least
    ``min_window_s`` (same discipline as bench_zoo.py): for sub-ms passes
    a 31-iteration window is a few ms, which relay/dispatch noise swamps —
    observed r4: a 0.5 ms tail measured "0.0 ms" at iters=31."""
    float(loop_fn(1))       # compile + warm the k=1 count
    float(loop_fn(iters))   # compile + warm the k=iters count
    t0 = time.perf_counter()
    float(loop_fn(iters))
    est = (time.perf_counter() - t0) / iters
    k = max(iters, min(int(min_window_s / max(est, 1e-8)), max_iters))
    if k != iters:
        float(loop_fn(k))   # compile + warm the scaled count (retrace trap)
    t_long = min(timed(lambda: float(loop_fn(k))) for _ in range(repeats))
    t_short = min(timed(lambda: float(loop_fn(1))) for _ in range(repeats))
    return max((t_long - t_short) / (k - 1), 1e-9)
