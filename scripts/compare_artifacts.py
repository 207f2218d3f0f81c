"""Accuracy delta between serving artifacts (f32 vs bf16 vs int8).

Runs the same synthetic batch through N artifacts of the SAME model and
reports per-pair max |logp| drift and argmax agreement — the accuracy side
of the precision-ladder serving table (latency side: serve.py bench).

Usage:
    python scripts/compare_artifacts.py m_f32.ser m_bf16.ser m_int8.ser
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main(paths):
    import numpy as np

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.serving import ServingModel

    served = [ServingModel.load(p) for p in paths]
    h0 = served[0].header
    L, B = served[0].buckets[-1]
    batch = synthetic_batch(L=L, B=B, n_classes=h0["n_classes"], seed=3)
    outs = []
    for p, s in zip(paths, served):
        assert s.header["model"] == h0["model"], (p, s.header["model"])
        r = s.predict(batch)
        outs.append((p, s.header.get("dtype", "f32"), r["logp"]))

    base_path, base_dtype, base = outs[0]
    report = {"model": h0["model"], "shape": [L, B],
              "baseline": {"path": base_path, "dtype": base_dtype}}
    for p, dt, logp in outs[1:]:
        valid = np.asarray(batch["umask"]) > 0
        d = np.abs(logp - base)[valid]
        agree = float((logp.argmax(-1) == base.argmax(-1))[valid].mean())
        report[dt] = {
            "path": p,
            "max_logp_drift": float(d.max()),
            "mean_logp_drift": float(d.mean()),
            "argmax_agreement": round(agree, 4),
        }
        print(f"{dt:>5s} vs {base_dtype}: maxdrift {d.max():.4g} "
              f"mean {d.mean():.4g} argmax agree {agree:.2%}", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1:])
