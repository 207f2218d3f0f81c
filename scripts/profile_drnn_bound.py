"""What bounds the DialogueRNN step: dispatch latency or weight streaming?

The r3 analysis called the post-chunking DRNN step "latency-bound" (serial
per-step op chain). But the step's six GRU kernels are ~21 MB/direction of
f32 (both directions stacked: ~42 MB/step), far past the 16 MB VMEM — so
XLA must re-stream most weights from HBM every scan step, and 42 MB /
819 GB/s = 51 us/step is the same order as the measured ~29 us/step.
Latency-bound and weight-traffic-bound BOTH predict cost flat in B; the
discriminating probe is bf16 (halves streamed bytes):

  - latency-bound      -> bf16 ~neutral (the flagship measured +1%)
  - weight-bound       -> bf16 -> up to 2x

Cases:
  bsweep  — eval ms/pass at B in {8, 31, 62, 124} (flatness = per-step
            cost independent of batch, consistent with either hypothesis)
  bf16    — eval/train ms/pass with params+inputs cast to bf16 vs f32
            (upper bound of the precision win; NOT production — the f32
            logit-parity contract stays the default)

Timing: on-device chained fori_loop, min-of-3 (CLAUDE.md relay rules).

Usage: python scripts/profile_drnn_bound.py [bsweep|bf16 ...]
"""

from __future__ import annotations

import json
import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x"))))

from _bench_util import per_pass_seconds  # noqa: E402
from profile_drnn import build  # noqa: E402


def eval_pass(L, B, dtype=None):
    import jax
    import jax.numpy as jnp

    spec, model, params, batch, args = build(L, B)
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        args = tuple(a.astype(dtype) if a.dtype == jnp.float32 else a
                     for a in args)

    def loop(params, x, rest, n):
        def body(i, acc):
            out = model.apply({"params": params},
                              x + (1e-30 * acc).astype(x.dtype), *rest,
                              deterministic=True)
            return jnp.sum(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    jloop = jax.jit(loop, static_argnums=3)
    return per_pass_seconds(lambda n: jloop(params, args[0], args[1:], n))


def weight_bytes():
    """Analytic per-step const (kernel) bytes the scan must read."""
    import numpy as np

    D_g = D_p = 500
    D_e = 300
    kernels = {
        "gWih_q": (D_p, 3 * D_g), "gWhh": (D_g, 3 * D_g),
        "pWih_c": (D_g, 3 * D_p), "pWhh": (D_p, 3 * D_p),
        "lWih_s": (D_p, 3 * D_p), "lWhh": (D_p, 3 * D_p),
        "eWih": (D_p, 3 * D_e), "eWhh": (D_e, 3 * D_e),
    }
    per_dir = sum(int(np.prod(s)) for s in kernels.values()) * 4
    return {"per_direction_f32_mb": round(per_dir / 2**20, 1),
            "both_directions_f32_mb": round(2 * per_dir / 2**20, 1),
            "hbm_floor_us_at_819GBps": round(2 * per_dir / 819e9 * 1e6, 1)}


def main(cases=None):
    cases = cases or ["bsweep", "bf16", "unroll"]
    out = {"weight_bytes": weight_bytes()}
    print(json.dumps(out["weight_bytes"]), flush=True)
    if "unroll" in cases:
        from ser_tpu import config

        try:
            for u in (1, 2, 4):
                config.DRNN_UNROLL = u
                t = eval_pass(108, 31) * 1e3
                out[f"eval_B31_unroll{u}_ms"] = round(t, 3)
                print(f"eval  L=108 B=31   unroll={u}  {t:8.3f} ms",
                      flush=True)
        finally:
            config.DRNN_UNROLL = 1
    if "bsweep" in cases:
        for B in (8, 31, 62, 124):
            t = eval_pass(108, B) * 1e3
            out[f"eval_B{B}_ms"] = round(t, 3)
            print(f"eval  L=108 B={B:<4d} f32  {t:8.3f} ms", flush=True)
    if "bf16" in cases:
        import jax.numpy as jnp

        for B in (31, 80):
            tf = eval_pass(108, B) * 1e3
            tb = eval_pass(108, B, jnp.bfloat16) * 1e3
            out[f"eval_B{B}_f32_ms"] = round(tf, 3)
            out[f"eval_B{B}_bf16_ms"] = round(tb, 3)
            print(f"eval  L=108 B={B:<4d} f32 {tf:8.3f} ms   "
                  f"bf16 {tb:8.3f} ms   ({tf/tb:.2f}x)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:] or None)
