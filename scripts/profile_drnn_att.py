"""Bound the cost of DialogueRNN's g_hist context attention.

Each scan step reads the full fixed-size [L, B, D_g] history buffer twice
(scores einsum + pooled einsum) even though only the t-step prefix is valid
— per pass that is O(L^2 * B * D_g) HBM traffic, the suspected dominant
cost of the zoo's slowest model. This script measures eval/train passes
with the attention intact vs ablated (dialogue_rnn._ABLATE_CONTEXT_ATT:
zeros for c_/alpha, buffer carry kept) to bound what an online-softmax
(flash-style, single-read) rewrite could recover.

Timing per CLAUDE.md: on-device chained fori_loop, min-of-3.

Usage:  python scripts/profile_drnn_att.py            (TPU)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from profile_drnn import eval_pass, train_pass  # noqa: E402


def main():
    from ser_tpu import config
    from ser_tpu.models import dialogue_rnn

    # _ABLATE_CONTEXT_ATT lives in the PER-STEP path only — pin
    # DRNN_CHUNK=None or the default auto-chunked path (which ignores the
    # flag) would make 'full' and 'no-att' time the same computation.
    # This probe therefore bounds the per-step attention cost, i.e. what
    # the chunked rewrite (config.DRNN_CHUNK) exists to recover.
    old_chunk = config.DRNN_CHUNK
    config.DRNN_CHUNK = None
    try:
        for shape_name, L, B, fn in (("eval", 108, 31, eval_pass),
                                     ("train", 110, 80, train_pass)):
            for ablate in (False, True):
                dialogue_rnn._ABLATE_CONTEXT_ATT = ablate
                try:
                    te = fn(L, B)
                finally:
                    dialogue_rnn._ABLATE_CONTEXT_ATT = False
                print(f"{shape_name:5s} L={L} B={B} "
                      f"{'no-att' if ablate else 'full':6s} "
                      f"{te*1e3:8.3f} ms", flush=True)
    finally:
        config.DRNN_CHUNK = old_chunk


if __name__ == "__main__":
    main()
