"""bf16-vs-f32 training convergence validation (VERDICT r4 item 1).

Mixed-precision training (``--compute_dtype bf16``: fwd+bwd bf16, f32
master params/Adam/loss) has measured speedups (DialogueRNN 1.67x,
flagship 1.22x at [110, 80], PERF.md) but, before this script, no
accuracy evidence. Here we train to completion on the synthetic IEMOCAP
set, multi-seed, f32 vs bf16, and compare final test weighted-F1 and
train loss. If the bf16-vs-f32 gap is within the across-seed spread,
bf16 is validated as the production training config (parity contracts
stay f32).

Usage:
    python scripts/convergence_bf16.py [--models MARN1_onlysp ...]
        [--seeds 3] [--epochs 20] [--out PERF_convergence.json]

Runs on the default backend (TPU under axon; SER_FORCE_CPU=1 for CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(model_name, seed, compute_dtype, loaders, epochs):
    from ser_tpu.train.trainer import ModelTrainer

    train_loader, _, test_loader = loaders
    trainer = ModelTrainer(
        model=model_name, n_classes=6, dataset="IEMOCAP", seed=seed,
        compute_dtype=compute_dtype, res_csv_path=None)
    t0 = time.time()
    losses = []
    for epoch in range(1, epochs + 1):
        _, loss = trainer.train_network(epoch, train_loader)
        losses.append(loss)
    acc, f1, _ = trainer.eval_network(test_loader)
    return {
        "final_loss": losses[-1],
        "first_loss": losses[0],
        "acc": acc,
        "f1": f1,
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*",
                   default=["MARN1_onlysp", "DialogueRNN", "MARN1_sps"])
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    if os.environ.get("SER_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from ser_tpu.data.loaders import get_loaders
    from ser_tpu.data.synthetic import generate_iemocap_pickles

    # One shared dataset for every run: differences must come from the
    # training precision / init seed only. min/max_len modest so the
    # per-batch pad shapes stay few (each distinct L is one XLA compile).
    data_dir = tempfile.mkdtemp(prefix="ser_conv_")
    feature_path = generate_iemocap_pickles(
        data_dir, n_train=48, n_test=16, min_len=12, max_len=24, seed=7)
    loaders = get_loaders(feature_path, dataset="IEMOCAP", batch_size=8,
                          valid=0.25, n_classes=6)

    results = {}
    for model_name in args.models:
        results[model_name] = {}
        for dtype in ("f32", "bf16"):
            per_seed = []
            for seed in range(args.seeds):
                r = run_one(model_name, 111 + seed, dtype, loaders,
                            args.epochs)
                per_seed.append(r)
                print(json.dumps({"model": model_name, "dtype": dtype,
                                  "seed": 111 + seed, **r}), flush=True)
            f1s = [r["f1"] for r in per_seed]
            results[model_name][dtype] = {
                "runs": per_seed,
                "f1_mean": round(sum(f1s) / len(f1s), 2),
                "f1_min": min(f1s),
                "f1_max": max(f1s),
            }
        f32, bf16 = results[model_name]["f32"], results[model_name]["bf16"]
        spread = max(f32["f1_max"] - f32["f1_min"], 1e-9)
        gap = f32["f1_mean"] - bf16["f1_mean"]
        results[model_name]["f1_gap_mean"] = round(gap, 2)
        results[model_name]["f32_seed_spread"] = round(spread, 2)
        results[model_name]["within_seed_noise"] = bool(abs(gap) <= spread)
        print(json.dumps({model_name: {
            "f32_f1": f32["f1_mean"], "bf16_f1": bf16["f1_mean"],
            "gap": results[model_name]["f1_gap_mean"],
            "f32_spread": results[model_name]["f32_seed_spread"],
            "within_seed_noise": results[model_name]["within_seed_noise"],
        }}), flush=True)

    import jax

    doc = {"backend": jax.default_backend(), "epochs": args.epochs,
           "seeds": args.seeds, "n_train": 48, "n_test": 16,
           "models": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"wrote {args.out}")
    print(json.dumps({"summary": {
        m: results[m]["within_seed_noise"] for m in args.models}}))


if __name__ == "__main__":
    main()
