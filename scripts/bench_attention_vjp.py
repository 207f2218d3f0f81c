"""Measure: hand-written VJP for the fused rank-1 attention vs the current
checkpoint+autodiff backward (PERF.md "remaining headroom" item).

Correctness: the candidate bwd must match autodiff grads (same rng ->
identical dropout mask) to rtol 1e-5 before timing counts.

Timing methodology per CLAUDE.md: on-device fori_loop chaining, min-of-3,
per-pass = (t_K - t_1)/(K - 1). Shapes: [B=80, D=128] x 2 directions
(vmapped), matching the production scan step, plus the step-level scan
context (110 steps) to capture fusion interactions.

Usage: python scripts/bench_attention_vjp.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def per_pass_seconds(loop_fn, iters=21, repeats=3):
    float(loop_fn(1))
    t_long = min(_timed(lambda: float(loop_fn(iters))) for _ in range(repeats))
    t_short = min(_timed(lambda: float(loop_fn(1))) for _ in range(repeats))
    return max((t_long - t_short) / (iters - 1), 1e-9)


def main():
    from ser_tpu.ops import attention as A

    B, D = 80, 128
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, kr = jax.random.split(key, 5)
    x1 = jax.random.normal(k1, (B, D))
    x2 = jax.random.normal(k2, (B, D))
    wq = jax.random.normal(k3, (D,)) * 0.1 + 1.0
    wk = jax.random.normal(k4, (D,)) * 0.1 + 1.0
    rng = jax.random.split(kr, 1)[0]

    results = {}

    # ---- correctness: candidate VJP vs autodiff on the checkpointed impl ---
    def loss_ref(x1, x2, wq, wk, train):
        out = A._rank1_fused(x1, x2, wq, wk, rng if train else None, 0.2)
        return jnp.sum(jnp.sin(out))

    def loss_new(x1, x2, wq, wk, train):
        out = A.rank1_cross_attention_vjp(
            x1, x2, wq, wk, 0.2, not train, rng if train else None)
        return jnp.sum(jnp.sin(out))

    for train in (False, True):
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x1, x2, wq, wk, train)
        gn = jax.grad(loss_new, argnums=(0, 1, 2, 3))(x1, x2, wq, wk, train)
        for a, b, name in zip(gr, gn, ("x1", "x2", "wq", "wk")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                err_msg=f"train={train} d{name}")
    results["grads_match"] = True

    # ---- timing: isolated op, fwd+bwd, both directions vmapped -------------
    x1d = jnp.stack([x1, x1 + 0.1])
    x2d = jnp.stack([x2, x2 - 0.1])
    rngs = jax.random.split(kr, 2)

    def make_loop(fn, train):
        def one(x1d, x2d, wq, wk):
            def f(args):
                x1d, x2d, wq, wk = args
                out = jax.vmap(fn, in_axes=(0, 0, None, None, 0))(
                    x1d, x2d, wq, wk,
                    rngs if train else jnp.zeros((2, 2), jnp.uint32))
                return jnp.sum(out * out)
            v, g = jax.value_and_grad(lambda a: f(a))((x1d, x2d, wq, wk))
            return v + sum(l.sum() for l in jax.tree_util.tree_leaves(g))

        @jax.jit
        def loop(x1d, x2d, wq, wk, n):
            def body(i, acc):
                return acc + one(x1d + 1e-30 * acc, x2d, wq, wk)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return lambda n: loop(x1d, x2d, wq, wk, n)

    def ref_fn(x1, x2, wq, wk, r):
        return A._rank1_fused(x1, x2, wq, wk, r if r.ndim else None, 0.2)

    def ref_eval(x1, x2, wq, wk, r):
        return A._rank1_fused(x1, x2, wq, wk, None, 0.2)

    def new_fn(x1, x2, wq, wk, r):
        return A.rank1_cross_attention_vjp(x1, x2, wq, wk, 0.2, False, r)

    def new_eval(x1, x2, wq, wk, r):
        return A.rank1_cross_attention_vjp(x1, x2, wq, wk, 0.2, True, None)

    for name, fn in (("ref_train", ref_fn), ("new_train", new_fn),
                     ("ref_eval", ref_eval), ("new_eval", new_eval)):
        results[f"op_{name}_us"] = per_pass_seconds(
            make_loop(fn, "train" in name), 51) * 1e6

    # ---- timing: inside a 110-step scan (the production context) -----------
    L = 110

    def make_scan_loop(fn, train):
        keys = jax.random.split(kr, (L, 2))

        def run(x1d, x2d, wq, wk):
            def step(carry, ks):
                c1, c2 = carry
                z = jax.vmap(fn, in_axes=(0, 0, None, None, 0))(
                    c1, c2, wq, wk,
                    ks if train else jnp.zeros((2, 2), jnp.uint32))
                return (c1 * 0.99 + 0.01 * z, c2 * 0.99 - 0.01 * z), ()
            (c1, c2), _ = jax.lax.scan(step, (x1d, x2d), keys)
            return jnp.sum(c1 * c1) + jnp.sum(c2 * c2)

        def one(x1d, x2d, wq, wk):
            v, g = jax.value_and_grad(
                lambda a: run(*a))((x1d, x2d, wq, wk))
            return v + sum(l.sum() for l in jax.tree_util.tree_leaves(g))

        @jax.jit
        def loop(x1d, x2d, wq, wk, n):
            def body(i, acc):
                return acc + one(x1d + 1e-30 * acc, x2d, wq, wk)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return lambda n: loop(x1d, x2d, wq, wk, n)

    for name, fn in (("ref_train", ref_fn), ("new_train", new_fn)):
        results[f"scan110_{name}_ms"] = per_pass_seconds(
            make_scan_loop(fn, True), 11) * 1e3

    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
