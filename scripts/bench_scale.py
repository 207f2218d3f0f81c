"""Scaling sweep: the flagship recurrence at production hidden sizes.

The reference tops out at H=128 where the recurrence is latency-bound
(PERF.md): per-step matmuls can't feed the MXU. This sweep measures the
SAME direction-vmapped scan at H in {128, 256, 512, 1024} (L=110, B=80,
eval fwd and train fwd+bwd) and reports achieved matmul TFLOP/s, to show
where the design transitions from latency-bound to compute-bound — i.e.
that the framework's ceiling rises with model size rather than being an
artifact of tiny shapes.

Usage: python scripts/bench_scale.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def per_pass_seconds(loop_fn, iters=11, repeats=3):
    float(loop_fn(1))
    t_long = min(_timed(lambda: float(loop_fn(iters))) for _ in range(repeats))
    t_short = min(_timed(lambda: float(loop_fn(1))) for _ in range(repeats))
    return max((t_long - t_short) / (iters - 1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.marn_onlysp import (
        MARNCellOnlySP, _eval_step, _train_step_dir)

    L, B = 110, 80
    batch = synthetic_batch(L=L, B=B, seed=1, min_len=20)
    qm = jnp.asarray(batch["qmask"])
    key = jax.random.PRNGKey(0)

    rows = []
    for H in (128, 256, 512, 1024):
        cell = MARNCellOnlySP(dh_l=H, dh_a=H, dh_s=H)
        xl = jax.random.normal(jax.random.PRNGKey(4), (L, B, 100))
        cp = cell.init({"params": key, "dropout": key}, xl, xl, qm,
                       True, mode="gather")["params"]

        def make_loop(train, cell=cell, cp=cp, xl=xl, H=H):
            step_dir = functools.partial(
                _train_step_dir, dropout_rate=0.5, attn_dropout=0.2)

            def run(p, xl_in, rng):
                seqs, consts = cell.apply({"params": p}, xl_in, xl_in, qm,
                                          True, mode="gather")
                seqs2 = jax.tree_util.tree_map(
                    lambda a: jnp.stack([a, a], axis=1), seqs)
                consts2 = jax.tree_util.tree_map(
                    lambda a: jnp.stack([a, a]), consts)
                z2 = lambda *s: jnp.zeros((2,) + s, xl_in.dtype)
                init = (z2(B, H), z2(B, H), z2(B, H), z2(B, H),
                        z2(B, H), z2(B, 2, H))
                if train:
                    keys = jax.random.split(rng, (L, 2))
                    seqs2 = seqs2 + (keys,)

                    def raw(carry, xs):
                        return jax.vmap(step_dir, in_axes=(0, 0, 0))(
                            consts2, carry, xs)
                    step = config.scan_remat(raw)
                else:
                    def step(carry, xs):
                        return jax.vmap(_eval_step, in_axes=(0, 0, 0))(
                            consts2, carry, xs)
                _, ys = jax.lax.scan(step, init, seqs2)
                return jnp.sum(ys)

            @jax.jit
            def loop(p, x, n):
                def body(i, acc):
                    if train:
                        v, g = jax.value_and_grad(run)(
                            p, x + 1e-30 * acc, jax.random.PRNGKey(7))
                        return v + sum(
                            l.sum() for l in jax.tree_util.tree_leaves(g))
                    return run(p, x + 1e-30 * acc, jax.random.PRNGKey(7))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return lambda n: loop(cp, xl, n)

        fwd_ms = per_pass_seconds(make_loop(False), 11) * 1e3
        bwd_ms = per_pass_seconds(make_loop(True), 6) * 1e3

        # per-step matmul FLOPs, both directions: 2 modalities x
        # [B,3H]@[3H,4H] + GRU [B,H]@[H,3H], x2 for the direction axis
        flops_step = 2 * (2 * (2 * B * 3 * H * 4 * H) + 2 * B * H * 3 * H)
        tflops_fwd = flops_step * L / (fwd_ms / 1e3) / 1e12
        rows.append({
            "H": H,
            "scan_fwd_ms": round(fwd_ms, 2),
            "scan_fwd_bwd_ms": round(bwd_ms, 2),
            "fwd_us_per_step": round(fwd_ms * 1e3 / L, 1),
            "matmul_tflops_fwd": round(tflops_fwd, 2),
        })
        print(json.dumps(rows[-1]))

    print(json.dumps({
        "backend": jax.default_backend(), "shape": [L, B], "sweep": rows}))


if __name__ == "__main__":
    main()
