"""Batch collation — padded, time-major, statically-shaped.

The reference collate (``dataloader.py:45-47``) pads tensor fields 0-6
time-major ([L, B, .]) and fields 7-8 (umask, label) batch-first ([B, L]).
We reproduce that wire format and add TPU-first static-shape control:
sequence lengths are rounded up to a bucket and the batch is padded to a
fixed size, so jit compiles once per bucket instead of once per batch shape.
Padded rows carry umask=0 and are exactly neutral in loss gradients and
metrics (see ser_tpu.train.losses).
"""

from __future__ import annotations

import numpy as np

try:
    from ser_tpu import native
except Exception:  # pragma: no cover - compiler-less environments
    native = None

DEFAULT_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 256)


def bucket_length(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def collate(items, pad_length=None, pad_batch=None, buckets=DEFAULT_BUCKETS):
    """Collate dataset items into one padded batch dict.

    Args:
      items: list of 10-field tuples from a dataset.
      pad_length: pad/clip L to this; None -> bucket of the batch max.
      pad_batch: pad batch dim to this with all-masked rows; None -> len(items).

    Returns:
      dict with r1..r4/visuf/acouf/qmask time-major [L, B, .], umask/label
      batch-first [B, L], and vid (list of ids, padded with None).
    """
    n = len(items)
    max_len = max(it[8].shape[0] for it in items)
    L = pad_length if pad_length is not None else bucket_length(max_len, buckets)
    if L < max_len:
        raise ValueError(f"pad_length {L} < batch max length {max_len}")
    B = pad_batch if pad_batch is not None else n
    if B < n:
        raise ValueError(f"pad_batch {B} < batch size {n}")

    names = ["r1", "r2", "r3", "r4", "visuf", "acouf", "qmask"]
    out = {}
    if native is not None and native.AVAILABLE:
        # C fast path (ser_tpu/native): memcpy-based ragged->padded scatter.
        for i, name in enumerate(names):
            out[name] = native.pad_time_major([it[i] for it in items], L, B)
        out["umask"] = native.pad_batch_first(
            [it[7] for it in items], L, B, np.float32)
        out["label"] = native.pad_batch_first(
            [it[8] for it in items], L, B, np.int32)
    else:
        for i, name in enumerate(names):
            d = items[0][i].shape[-1]
            arr = np.zeros((L, B, d), dtype=np.float32)
            for b, it in enumerate(items):
                t = it[i].shape[0]
                arr[:t, b] = it[i]
            out[name] = arr
        umask = np.zeros((B, L), dtype=np.float32)
        label = np.zeros((B, L), dtype=np.int32)
        for b, it in enumerate(items):
            t = it[8].shape[0]
            umask[b, :t] = it[7]
            label[b, :t] = it[8]
        out["umask"] = umask
        out["label"] = label
    out["vid"] = [it[9] for it in items] + [None] * (B - n)
    if len(items[0]) > 10:
        # optional raw-audio field for the on-device MFCC front-end.
        # Dialogues may carry different sample lengths: pad to the batch
        # max rounded up to a 2048-sample bucket (jit compiles once per
        # bucket, not per batch), and emit per-dialogue sample counts so
        # the front-end pools over real frames only (zero-padded tails
        # would otherwise pollute the mean/std pooling with silence).
        T = max(it[10].shape[-1] for it in items)
        T = -(-T // 2048) * 2048
        wav = np.zeros((L, B, T), dtype=np.float32)
        wav_len = np.zeros((B,), dtype=np.int32)
        for b, it in enumerate(items):
            wav[: it[10].shape[0], b, : it[10].shape[-1]] = it[10]
            wav_len[b] = it[10].shape[-1]
        out["wav"] = wav
        out["wav_len"] = wav_len
    return out
