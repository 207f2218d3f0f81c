"""Measure the PyTorch-CPU reference baseline (utterances/sec, eval forward).

Imports the reference implementation from /root/reference *in place* (no code
copied) by shimming its broken package names ('models' -> model/,
'attention' -> 'attention:' — see SURVEY.md repo-health notes), then times
the reference MARN1_onlysp eval forward on IEMOCAP-shaped synthetic data on
CPU. Writes baselines/torch_cpu.json consumed by bench.py.

Run: python baselines/measure_torch_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"


def import_reference_model():
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [os.path.join(REFERENCE, "model")]
    sys.modules.setdefault("models", models_pkg)
    att_pkg = types.ModuleType("attention")
    att_pkg.__path__ = [os.path.join(REFERENCE, "attention:")]
    sys.modules.setdefault("attention", att_pkg)

    from models.lsthm_onlysp import MARN1_onlysp  # noqa: E402

    return MARN1_onlysp


def iemocap_eval_shapes(seed=0):
    """Realistic IEMOCAP test split: 31 dialogues, ~1623 utterances."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(20, 111, size=31)
    lengths = (lengths * (1623 / lengths.sum())).astype(int)
    lengths = np.maximum(lengths, 5)
    return lengths


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    MARN1_onlysp = import_reference_model()

    lengths = iemocap_eval_shapes()
    L, B = int(lengths.max()), len(lengths)
    n_utts = int(lengths.sum())

    rng = np.random.default_rng(1)
    x = torch.tensor(rng.standard_normal((L, B, 1124)).astype(np.float32))
    qmask = torch.zeros(L, B, 2)
    sp = rng.integers(0, 2, size=(L, B))
    for t in range(L):
        for b in range(B):
            if t < lengths[b]:
                qmask[t, b, sp[t, b]] = 1.0
    umask = torch.tensor(
        (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    )

    model = MARN1_onlysp(6)
    model.eval()

    with torch.no_grad():
        model(x, qmask, umask)  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(x, qmask, umask)
            times.append(time.perf_counter() - t0)

    sec = float(np.median(times))
    utts_per_sec = n_utts / sec
    out = {
        "metric": "utterances/sec (eval forward, reference MARN1_onlysp)",
        "value": utts_per_sec,
        "seconds_per_pass": sec,
        "n_utterances": n_utts,
        "shape": [L, B],
        "hardware": f"CPU x{os.cpu_count()}",
        "torch_version": torch.__version__,
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(os.path.dirname(__file__), "torch_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
