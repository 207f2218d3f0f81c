"""Profiling & debugging hooks (SURVEY §5.1/5.2 — absent in the reference).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  Perfetto/XProf trace of everything run inside.
- ``annotate(name)``: TraceAnnotation for labeling train/eval phases.
- ``StepTimer``: host-side per-step wall-clock accumulator with summary.
- ``enable_nan_checks()``: flips ``jax_debug_nans`` so the first NaN raises
  with a jaxpr location instead of silently poisoning training.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_trace: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_trace=create_perfetto_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Host-side step timing: records wall-clock per named phase."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3),
            }
            for name in self.totals
        }
