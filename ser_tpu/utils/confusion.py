"""Confusion-matrix percent plot (ref ``/root/reference/utils.py:40-90``).

Computes the row-normalized confusion matrix in numpy and saves pdf+png via
matplotlib (Agg backend; no display needed).
"""

from __future__ import annotations

import numpy as np


def confusion_matrix(y_true, y_pred, labels):
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    k = len(labels)
    index = {c: i for i, c in enumerate(labels)}
    cm = np.zeros((k, k), dtype=np.int64)
    for t, p in zip(y_true, y_pred):
        if t in index and p in index:
            cm[index[t], index[p]] += 1
    return cm


def cm_analysis(y_true, y_pred, filename, labels, ymap=None, figsize=(10, 10)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ymap is not None:
        y_pred = [ymap[yi] for yi in y_pred]
        y_true = [ymap[yi] for yi in y_true]
        labels = [ymap[yi] for yi in labels]
    cm = confusion_matrix(y_true, y_pred, labels)
    cm_sum = np.sum(cm, axis=1, keepdims=True)
    cm_perc = cm / np.maximum(cm_sum, 1).astype(float) * 100

    fig, ax = plt.subplots(figsize=figsize)
    fontsize = 17
    im = ax.imshow(cm_perc, cmap="bone_r", vmin=0, vmax=100)
    ax.set_xticks(range(len(labels)), labels, fontsize=fontsize)
    ax.set_yticks(range(len(labels)), labels, fontsize=fontsize)
    ax.set_xlabel("Predicted", fontsize=fontsize)
    ax.set_ylabel("Actual", fontsize=fontsize)
    for i in range(len(labels)):
        for j in range(len(labels)):
            ax.text(
                j, i, "%.1f%%" % cm_perc[i, j], ha="center", va="center",
                fontsize=10,
            )
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(f"{filename}.pdf")
    fig.savefig(f"{filename}.png")
    plt.close(fig)
    return cm_perc
