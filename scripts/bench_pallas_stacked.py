"""Earn-or-retire bench: row-stacked bidirectional Pallas recurrence vs the
production direction-vmapped lax.scan (and the retired d-loop bidir kernel).

Shapes: the bench headline eval shape [T=110, B=31] and the train-eval
shape [T=110, B=80] (the stacked kernel's [2Bp, H, H] attention
intermediate may spill VMEM there — expected gate boundary).

Timing per CLAUDE.md: on-device fori_loop chaining, min-of-3.

Usage: python scripts/bench_pallas_stacked.py [T B ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(globals().get("__file__", "scripts/x")))))
from _bench_util import per_pass_seconds  # noqa: E402


def bench_shape(T, B):
    import jax

    if _os.environ.get("SER_FORCE_CPU"):  # CPU smoke (tests / relay outage)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ser_tpu.models.marn_onlysp import _eval_step
    from ser_tpu.ops.pallas import lsthm as pk

    H = 128
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    sp = rng.integers(0, 2, size=(T, 2, B))
    qm = np.zeros((T, 2, B, 2), np.float32)
    qm[np.arange(T)[:, None, None], np.arange(2)[None, :, None],
       np.arange(B)[None, None, :], sp] = 1
    seqs = (f(T, 2, B, 4 * H), f(T, 2, B, 4 * H), f(T, 2, B, 3 * H),
            jnp.asarray(qm))
    consts = (f(2, 3 * H, 4 * H), f(2, 4 * H), f(2, 3 * H, 4 * H),
              f(2, 4 * H), f(2, H, 3 * H), f(2, 3 * H), f(2, H), f(2, H))

    out = {}

    def scan_fn(seqs):
        init = tuple(jnp.zeros((2, B, H)) for _ in range(5)) + (
            jnp.zeros((2, B, 2, H)),)
        _, ys = jax.lax.scan(
            lambda c, xs: jax.vmap(_eval_step, in_axes=(0, 0, 0))(
                consts, c, xs),
            init, seqs)
        return ys

    variants = {
        "scan": scan_fn,
        "pallas_stacked": lambda s: pk.lsthm_onlysp_recurrence_bidir_stacked(
            s, consts),
        "pallas_dloop": lambda s: pk.lsthm_onlysp_recurrence_bidir(s, consts),
    }
    for name, fn in variants.items():
        @jax.jit
        def loop(seqs, n, fn=fn):
            def body(i, acc):
                s = (seqs[0] + 1e-30 * acc,) + seqs[1:]
                return jnp.sum(fn(s))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        try:
            ms = per_pass_seconds(lambda n: loop(seqs, n)) * 1e3
        except Exception as e:  # VMEM OOM expected past the gate
            out[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
            continue
        out[name] = round(ms, 4)

        # numeric check vs scan
        if name != "scan":
            a = np.asarray(jax.jit(fn)(seqs))
            b = np.asarray(jax.jit(scan_fn)(seqs))
            out[name + "_maxerr"] = float(np.abs(a - b).max())
    return out


def main():
    shapes = [(110, 31), (110, 80)]
    if len(sys.argv) > 1:
        vals = [int(v) for v in sys.argv[1:]]
        shapes = list(zip(vals[::2], vals[1::2]))
    for T, B in shapes:
        res = bench_shape(T, B)
        print(json.dumps({"T": T, "B": B, **res}), flush=True)


if __name__ == "__main__":
    main()
