"""Result analysis — the reference's demo.ipynb as a CLI tool.

Recomputes weighted accuracy / weighted F1 and per-class accuracy from a
``res.csv`` eval dump (cells 3-15 of ``/root/reference/demo.ipynb``), renders
the confusion-matrix percent plot (``utils.py:40-90``), and plots learned
fusion-weight trajectories from ``parameters.csv`` (cell 50).

Usage:
    python analysis.py --res res.csv [--parameters parameters.csv]
                       [--out analysis_out] [--labels hap sad neu ang exc fru]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

IEMOCAP_LABELS = ["hap", "sad", "neu", "ang", "exc", "fru"]


def analyze_res(res_path, labels=None, out_dir=None):
    import pandas as pd

    from ser_tpu.train.metrics import weighted_accuracy, weighted_f1
    from ser_tpu.utils.confusion import cm_analysis

    df = pd.read_csv(res_path)
    preds = df["preds"].to_numpy()
    golds = df["labels"].to_numpy()
    masks = df["masks"].to_numpy()

    report = {
        "n_rows": int(len(df)),
        "n_valid": int(masks.sum()),
        "weighted_accuracy": weighted_accuracy(golds, preds, masks),
        "weighted_f1": weighted_f1(golds, preds, masks),
    }
    per_class = {}
    classes = np.unique(golds[masks > 0])
    for c in classes:
        sel = (golds == c) & (masks > 0)
        per_class[int(c)] = round(float((preds[sel] == c).mean()) * 100, 2)
    report["per_class_accuracy"] = per_class
    report["mean_per_class_accuracy"] = round(
        float(np.mean(list(per_class.values()))), 2)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        names = labels or [str(c) for c in classes]
        valid = masks > 0
        cm_analysis(
            [names[int(g)] for g in golds[valid]],
            [names[int(p)] for p in preds[valid]],
            os.path.join(out_dir, "confusion"),
            names,
        )
        report["confusion_plot"] = os.path.join(out_dir, "confusion.png")
    return report


def plot_parameters(parameters_path, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    try:
        df = pd.read_csv(parameters_path)
    except pd.errors.EmptyDataError:
        # the reference's own parameters.csv ships empty (vestigial
        # producer, model_trainer.py:160-167)
        return None
    if df.empty:
        return None
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    for col in df.columns:
        ax.plot(df[col], label=col)
    ax.set_xlabel("eval step")
    ax.set_ylabel("fusion weight")
    ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "fusion_weights.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", default="res.csv")
    p.add_argument("--parameters", default=None)
    p.add_argument("--out", default="analysis_out")
    p.add_argument("--labels", nargs="*", default=IEMOCAP_LABELS)
    args = p.parse_args()

    report = analyze_res(args.res, labels=args.labels, out_dir=args.out)
    if args.parameters and os.path.exists(args.parameters):
        path = plot_parameters(args.parameters, args.out)
        if path:
            report["fusion_weights_plot"] = path
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
