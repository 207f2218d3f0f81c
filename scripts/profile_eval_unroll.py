"""Does scan unroll help the EVAL passes too? (round-5 follow-up)

The r5 variant bound diagnosis (profile_variant_bound.py) found la's TRAIN
step weight-stream bound and landed config.SCAN_UNROLL auto {la: 4, cf: 2}
for train mode only — eval was unmeasured and left at unroll 1. But the
same per-step weight traffic (la streams ~4.6 MB/step of gate-LSTM + LSTHM
kernels x 2 directions) flows in the eval forward, so unroll may amortize
it there as well. This probe measures eval ms/pass at the zoo eval shape
(bench_zoo.iemocap_eval_batch) with lax.scan unroll patched to 1/2/4 at
trace time, min-of-3 on-device fori_loop windows (CLAUDE.md relay rules).

Usage: python scripts/profile_eval_unroll.py [--models MARN1_la ...]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x")))))


def eval_ms(name, batch, n_utts, unroll=1):
    import jax

    from bench_zoo import bench_model

    if unroll != 1:
        orig_scan = jax.lax.scan

        def unrolled_scan(*a, **k):
            k.setdefault("unroll", unroll)
            return orig_scan(*a, **k)

        jax.lax.scan = unrolled_scan
    try:
        r = bench_model(name, batch, n_utts, iters=20)
    finally:
        if unroll != 1:
            jax.lax.scan = orig_scan
    return r["ms_per_pass"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*",
                   default=["MARN1_la", "MARN1_mf", "MARN1_cf",
                            "MARN1_azs", "MARN1_newz"])
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from bench_zoo import iemocap_eval_batch

    batch, n_utts = iemocap_eval_batch()
    rows = {}
    for name in args.models:
        row = {}
        for u in (1, 2, 4):
            t = eval_ms(name, batch, n_utts, unroll=u)
            row[f"eval_unroll{u}_ms"] = t
            print(f"{name:<11s} eval unroll={u}  {t:8.3f} ms/pass",
                  flush=True)
        rows[name] = row
    print(json.dumps(rows))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
