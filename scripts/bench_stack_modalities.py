"""A/B the modality-stacked variant steps (config.STACK_MODALITIES).

The r5 bound pre-read: sp/cf are bf16-NEUTRAL in the train zoo
(zoo_train_r04 vs zoo_train_bf16_r05: 1.09x / 1.08x) — i.e. not
traffic-bound, so the remaining lever is serial per-step op count. The
stacked steps collapse the independent per-step LSTHM chains into one
batched einsum + one gate pass (exactness: tests/test_stack_modalities.py).
This measures train + eval ms at the reference shape [110, 80] with the
gate off vs on (same on-device fori_loop min-of-3 methodology as bench_zoo).

Usage: python scripts/bench_stack_modalities.py [--models MARN1_sp ...]
       [--eval-only|--train-only]
"""

from __future__ import annotations

import json
import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x")))))

L, B = 110, 80


def measure(name, stacked, train):
    from bench_zoo import bench_model, bench_model_train
    from ser_tpu import config
    from ser_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(L=L, B=B, seed=1)
    n_utts = float(batch["umask"].sum())
    old = config.STACK_MODALITIES
    config.STACK_MODALITIES = stacked
    try:
        if train:
            r = bench_model_train(name, batch, n_utts, iters=10)
        else:
            r = bench_model(name, batch, n_utts, iters=20)
    finally:
        config.STACK_MODALITIES = old
    return r["ms_per_step" if train else "ms_per_pass"]


def main(argv):
    models = ["MARN1_sp", "MARN1_cf", "MARN1_azs"]
    if "--models" in argv:
        i = argv.index("--models")
        models = argv[i + 1:]
    modes = [("eval", False), ("train", True)]
    if "--eval-only" in argv:
        modes = modes[:1]
    if "--train-only" in argv:
        modes = modes[1:]

    out = {}
    for name in models:
        row = {}
        for label, train in modes:
            off = measure(name, False, train)
            on = measure(name, True, train)
            row[f"{label}_off_ms"], row[f"{label}_on_ms"] = off, on
            print(f"{name:<10s} {label:<5s} off {off:8.3f} ms  "
                  f"on {on:8.3f} ms  ({off/on:.2f}x)", flush=True)
        out[name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
