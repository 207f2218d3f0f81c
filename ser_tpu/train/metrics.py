"""Evaluation metrics — mask-weighted accuracy and weighted F1.

Mirrors the reference's sklearn calls (``model_trainer.py:157-158``):
``accuracy_score(labels, preds, sample_weight=masks)`` and
``f1_score(..., average='weighted', sample_weight=masks)``, both scaled by
100 and rounded to 2 decimals. Implemented in pure numpy (with an sklearn
parity test in tests/) so the metric path has no hard sklearn dependency.
"""

from __future__ import annotations

import numpy as np


def weighted_accuracy(labels, preds, masks) -> float:
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    masks = np.asarray(masks, dtype=np.float64)
    total = masks.sum()
    if total == 0:
        return 0.0
    correct = ((labels == preds).astype(np.float64) * masks).sum()
    return round(float(correct / total) * 100, 2)


def topk_accuracy(output, target, topk=(1,)):
    """Precision@k (ref ``utils.py:107-120``): output [N, C] scores,
    target [N]; returns a list of percentages, one per k."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    # top-maxk predictions per row, best first
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    return [round(float(correct[:, :k].any(axis=1).mean()) * 100, 4)
            for k in topk]


def weighted_f1(labels, preds, masks) -> float:
    """Weighted-average F1 with sample weights, sklearn-compatible.

    Per sklearn semantics: classes present in either labels or preds are
    scored; the average is weighted by (weighted) support of true labels.
    """
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    masks = np.asarray(masks, dtype=np.float64)

    classes = np.unique(np.concatenate([labels, preds]))
    f1s, supports = [], []
    for c in classes:
        tp = (((labels == c) & (preds == c)) * masks).sum()
        fp = (((labels != c) & (preds == c)) * masks).sum()
        fn = (((labels == c) & (preds != c)) * masks).sum()
        denom = 2 * tp + fp + fn
        f1 = (2 * tp / denom) if denom > 0 else 0.0
        support = ((labels == c) * masks).sum()
        f1s.append(f1)
        supports.append(support)

    supports = np.asarray(supports)
    if supports.sum() == 0:
        return 0.0
    f1w = float((np.asarray(f1s) * supports).sum() / supports.sum())
    return round(f1w * 100, 2)
