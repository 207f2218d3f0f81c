"""Flagship throughput vs batch size — the capacity-planning table.

Eval and train utterances/sec for MARN1_onlysp at L=110 across dialogue
batch sizes. The recurrence is dependency-bound, so per-pass latency grows
far slower than B: larger serving batches amortize the scan's fixed
latency until the per-step matmuls spill MXU tiles.

Timing: on-device chained fori_loop, per-pass = (t_K - t_1)/(K - 1), min
of 3 (see CLAUDE.md).

Usage:  python scripts/bench_batch_sweep.py [eval-16 eval-80 train-31 ...]
        (no args = all cases; one case per invocation dodges relay-compile
        timeouts on fresh shapes)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

BATCHES = (16, 31, 80, 256)
L = 110


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def per_pass_seconds(loop_fn, iters=11, repeats=3):
    float(loop_fn(1))
    t_long = min(_timed(lambda: float(loop_fn(iters))) for _ in range(repeats))
    t_short = min(_timed(lambda: float(loop_fn(1))) for _ in range(repeats))
    return max((t_long - t_short) / (iters - 1), 1e-9)


def build(B):
    import jax
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=1, min_len=20).items()
             if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    n_utts = float(batch["umask"].sum())
    return spec, model, params, batch, args, n_utts


def eval_case(B):
    import jax
    import jax.numpy as jnp

    spec, model, params, batch, args, n_utts = build(B)

    def loop(p, x, rest, n):
        def body(i, acc):
            out = model.apply({"params": p},
                              x + (1e-30 * acc).astype(x.dtype), *rest,
                              deterministic=True)
            return jnp.sum(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    jloop = jax.jit(loop, static_argnums=3)
    sec = per_pass_seconds(lambda n: jloop(params, args[0], args[1:], n))
    return sec, n_utts


def train_case(B):
    import jax
    import jax.numpy as jnp

    from ser_tpu.train.losses import masked_loss

    spec, model, params, batch, args, n_utts = build(B)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    def loss_fn(p, x, rest, rng):
        out = model.apply({"params": p}, x, *rest, deterministic=False,
                          rngs={"dropout": rng})
        return masked_loss(spec.extract_logp(out), labels, umask)

    def loop(p, x, rest, n):
        def body(i, carry):
            acc, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x + (1e-30 * acc).astype(x.dtype), rest, sub)
            leafsum = sum(jnp.sum(g.astype(jnp.float32))
                          for g in jax.tree_util.tree_leaves(grads))
            return loss.astype(jnp.float32) + 1e-30 * leafsum, rng
        out, _ = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), jax.random.PRNGKey(7)))
        return out

    jloop = jax.jit(loop, static_argnums=3)
    sec = per_pass_seconds(lambda n: jloop(params, args[0], args[1:], n))
    return sec, n_utts


def main(cases=None):
    all_cases = {}
    for B in BATCHES:
        all_cases[f"eval-{B}"] = ("eval", B)
        all_cases[f"train-{B}"] = ("train", B)
    for name in (cases or all_cases):
        kind, B = all_cases[name]
        sec, n_utts = (eval_case if kind == "eval" else train_case)(B)
        print(f"{kind:5s} B={B:4d} L={L}  {sec*1e3:8.3f} ms/pass  "
              f"{n_utts/sec:>12,.0f} utts/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
