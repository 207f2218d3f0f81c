"""Flagship eval throughput under each --encoder_attention kind.

The attention-zoo live surface (ops/encoder_attention.py) swaps the
EncoderLayer's MHA for a catalog sequence op; this measures what each swap
costs/buys at the IEMOCAP eval shape. Run on TPU:

    python scripts/bench_encoder_attention.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import iemocap_eval_batch  # noqa: E402
from bench_zoo import bench_model  # noqa: E402


def main():
    from ser_tpu import config
    from ser_tpu.ops.encoder_attention import SEQUENCE_KINDS

    batch, n_utts = iemocap_eval_batch()
    try:
        for kind in SEQUENCE_KINDS:
            config.ENCODER_ATTENTION = kind
            res = bench_model("MARN1_onlysp", batch, n_utts)
            print(json.dumps({kind: res}), flush=True)
    finally:
        config.ENCODER_ATTENTION = "mha"


if __name__ == "__main__":
    main()
