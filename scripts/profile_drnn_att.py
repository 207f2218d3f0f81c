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
    from ser_tpu.models import dialogue_rnn

    for shape_name, L, B, fn in (("eval", 108, 31, eval_pass),
                                 ("train", 110, 80, train_pass)):
        for ablate in (False, True):
            dialogue_rnn._ABLATE_CONTEXT_ATT = ablate
            try:
                te = fn(L, B)
            finally:
                dialogue_rnn._ABLATE_CONTEXT_ATT = False
            print(f"{shape_name:5s} L={L} B={B} "
                  f"{'no-att' if ablate else 'full':6s} {te*1e3:8.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
