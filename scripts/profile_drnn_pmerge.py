"""DialogueRNN p-cell projection-fusion A/B (config.DRNN_PMERGE).

The chunked path's serial per-step chain is the model's dominant remaining
cost (PERF.md r3); the fusion removes the [B, D_g] x [D_g, 3*D_p] context
projection from that chain (see config.py::DRNN_PMERGE). This measures the
chunked baseline vs the fused form at both production shapes:

  eval  [L=108, B=31]  (bench.py's IEMOCAP eval composition)
  train [L=110, B=80]  (reference batch_size default)

Timing: shared scripts/_bench_util.per_pass_seconds (chained on-device
fori_loop, auto-scaled window >= 150 ms, min of 3).

Usage:  python scripts/profile_drnn_pmerge.py [case ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from _bench_util import per_pass_seconds  # noqa: E402
from profile_drnn import eval_pass, train_pass  # noqa: E402


def main(cases=None):
    import os

    if os.environ.get("SER_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ser_tpu import config

    all_cases = {
        "eval-base": ("eval", 108, 31, False),
        "eval-pmerge": ("eval", 108, 31, True),
        "train-base": ("train", 110, 80, False),
        "train-pmerge": ("train", 110, 80, True),
    }
    results = {}
    try:
        for name in (cases or all_cases):
            shape_name, L, B, mode = all_cases[name]
            config.DRNN_PMERGE = mode
            sec = (eval_pass(L, B) if shape_name == "eval"
                   else train_pass(L, B))
            results[name] = round(sec * 1e3, 3)
            print(f"{name:13s} L={L} B={B} {sec * 1e3:8.3f} ms", flush=True)
    finally:
        config.DRNN_PMERGE = "auto"
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:] or None)
