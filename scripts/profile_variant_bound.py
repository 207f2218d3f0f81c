"""What bounds the low-MFU variant TRAIN steps (VERDICT r4 weak #3)?

`baselines/zoo_train_r04.json` shows MARN1_la at 0.33% of f32 peak
(10.6 ms/step for ~3.4 GFLOP), cf 0.83%, sp 0.99% — far below the flagship's
1.5%. The flagship and DialogueRNN got full bound diagnoses in r4; these
variants were presumed latency-bound by analogy. Same discriminating probes,
flagship-style, on the full train step (fwd+bwd+Adam, trainer semantics):

  bsweep — train ms/step at B in {20, 40, 80, 160}:
             flat in B      -> per-step serial-chain latency or weight
                               streaming (both B-independent)
             linear in B    -> activation traffic / VPU work
  bf16   — mixed-precision step (bench_zoo's compute_dtype path) vs f32:
             ~neutral       -> latency-bound (dependency chain)
             up to 2x       -> HBM-traffic-bound
  unroll — lax.scan unroll 1/2/4 (patched in at trace time):
             a win          -> per-step loop/dispatch overhead
             neutral        -> dependency-bound (flagship's known result)

Timing: on-device chained fori_loop, min-of-3 (CLAUDE.md relay rules),
via bench_zoo.bench_model_train at each shape.

Usage: python scripts/profile_variant_bound.py [bsweep|bf16|unroll ...]
       [--models MARN1_la MARN1_cf MARN1_sp]
"""

from __future__ import annotations

import json
import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x")))))

L = 110


def train_ms(name, B, compute_dtype=None, unroll=1):
    import jax

    from bench_zoo import bench_model_train
    from ser_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(L=L, B=B, seed=1)
    n_utts = float(batch["umask"].sum())
    if unroll != 1:
        orig_scan = jax.lax.scan

        def unrolled_scan(*a, **k):
            k.setdefault("unroll", unroll)
            return orig_scan(*a, **k)

        jax.lax.scan = unrolled_scan
    try:
        r = bench_model_train(name, batch, n_utts, iters=10,
                              compute_dtype=compute_dtype)
    finally:
        if unroll != 1:
            jax.lax.scan = orig_scan
    return r["ms_per_step"]


def main(argv):
    import jax.numpy as jnp

    models = ["MARN1_la", "MARN1_cf", "MARN1_sp"]
    if "--models" in argv:
        i = argv.index("--models")
        models = argv[i + 1:]
        argv = argv[:i]
    cases = [a for a in argv if not a.startswith("-")] or [
        "bsweep", "bf16", "unroll"]

    out = {}
    for name in models:
        row = {}
        if "bsweep" in cases:
            for B in (20, 40, 80, 160):
                t = train_ms(name, B)
                row[f"train_B{B}_ms"] = t
                print(f"{name:<10s} train L={L} B={B:<4d} f32  "
                      f"{t:8.3f} ms", flush=True)
        if "bf16" in cases:
            tf = row.get("train_B80_ms") or train_ms(name, 80)
            tb = train_ms(name, 80, compute_dtype=jnp.bfloat16)
            row["train_B80_f32_ms"], row["train_B80_bf16_ms"] = tf, tb
            print(f"{name:<10s} train B=80 f32 {tf:8.3f} ms  "
                  f"bf16 {tb:8.3f} ms  ({tf/tb:.2f}x)", flush=True)
        if "unroll" in cases:
            for u in (2, 4):
                t = train_ms(name, 80, unroll=u)
                row[f"train_B80_unroll{u}_ms"] = t
                print(f"{name:<10s} train B=80 unroll={u}  "
                      f"{t:8.3f} ms", flush=True)
        out[name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
