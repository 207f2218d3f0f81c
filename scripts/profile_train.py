"""Train-step profile for the flagship MARN1_onlysp (VERDICT r1 item 1).

Measures, on the default backend (TPU v5e-1 under the driver):
  1. eval forward at the train shape [L=110, B=80]
  2. full train step (fwd+bwd+Adam) per scan-remat policy: full / dots / none
  3. component split: encoder fwd+bwd, fused recurrence fwd and fwd+bwd,
     head fwd+bwd — so the scan's share of the step is a measured number,
     not a guess.

Timing methodology (see CLAUDE.md): on the axon relay ``block_until_ready``
is a no-op, so every measurement chains K iterations on-device via
``lax.fori_loop`` with a tiny data dependency and fetches one scalar;
per-pass = (t_K - t_1) / (K - 1), min over 3 runs.

Usage:  python scripts/profile_train.py
"""

from __future__ import annotations

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
    """loop_fn(n) must run n chained passes on device and return a scalar."""
    float(loop_fn(1))  # compile + warm
    t_long = min(_timed(lambda: float(loop_fn(iters))) for _ in range(repeats))
    t_short = min(_timed(lambda: float(loop_fn(1))) for _ in range(repeats))
    return max((t_long - t_short) / (iters - 1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ser_tpu import config
    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss
    from ser_tpu.train.optim import torch_adam

    L, B = 110, 80
    batch = synthetic_batch(L=L, B=B, seed=1, min_len=20)
    tb = {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}

    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(tb)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, *args, deterministic=True)["params"]
    labels = tb["label"].reshape(-1)
    results = {}

    # ---- 1. eval forward at the train shape --------------------------------
    def eval_loop_builder():
        @jax.jit
        def loop(params, n):
            def body(i, acc):
                logp = model.apply(
                    {"params": params}, args[0] + 1e-30 * acc, args[1],
                    args[2], deterministic=True)[0]
                return jnp.sum(logp)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return lambda n: loop(params, n)

    results["eval_fwd_ms"] = per_pass_seconds(eval_loop_builder(), 21) * 1e3

    # ---- 2. train step per remat policy -------------------------------------
    tx = torch_adam()
    opt0 = tx.init(params)

    def train_loop_builder():
        def train_step(p, o, x, rng):
            def loss_fn(pp):
                logp = model.apply(
                    {"params": pp}, x, args[1], args[2], deterministic=False,
                    rngs={"dropout": rng})[0]
                return masked_loss(logp, labels, tb["umask"])
            loss, grads = jax.value_and_grad(loss_fn)(p)
            o.hyperparams["learning_rate"] = jnp.float32(1e-3)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), o, loss

        def _loop(p, o, x, rng, n):
            def body(i, carry):
                pp, oo, r = carry
                r, sub = jax.random.split(r)
                pp, oo, _ = train_step(pp, oo, x, sub)
                return (pp, oo, r)
            out = jax.lax.fori_loop(0, n, body, (p, o, rng))
            return jax.tree_util.tree_leaves(out[0])[0].sum()

        loop = jax.jit(_loop, static_argnums=4)
        rng0 = jax.random.PRNGKey(2)
        return lambda n: loop(params, opt0, args[0], rng0, n)

    for mode in ("full", "dots", "none"):
        config.SCAN_REMAT = mode
        results[f"train_step_{mode}_ms"] = (
            per_pass_seconds(train_loop_builder(), 11) * 1e3)
    config.SCAN_REMAT = "dots"

    # ---- 3. component split --------------------------------------------------
    from ser_tpu.models.marn_onlysp import MARNCellOnlySP, _train_step_dir
    from ser_tpu.ops.encoder import EncoderLayer

    # encoders: linear_in + 2x shared EncoderLayer per modality, fwd+bwd
    enc = EncoderLayer(100, 40, 8, 40, 40)
    xe = jax.random.normal(jax.random.PRNGKey(3), (B, L, 100))
    ep = enc.init({"params": key, "dropout": key}, xe, deterministic=True)[
        "params"]

    def enc_loop_builder():
        def fwd(p, x, rng):
            y, _ = enc.apply({"params": p}, x, deterministic=False,
                             rngs={"dropout": rng})
            y, _ = enc.apply({"params": p}, x + y, deterministic=False,
                             rngs={"dropout": rng})
            return jnp.sum(y)

        @jax.jit
        def loop(p, x, n):
            def body(i, acc):
                # grad wrt params; x perturbed to carry the dependency.
                # Sum ALL leaves — summing one leaf lets XLA dead-code-
                # eliminate the rest of the backward.
                v, g = jax.value_and_grad(fwd)(p, x + 1e-30 * acc,
                                               jax.random.PRNGKey(7))
                return v + sum(l.sum() for l in jax.tree_util.tree_leaves(g))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        # x4: two modalities x (the reference applies the same encoder twice,
        # already inside fwd)
        return lambda n: loop(ep, xe, n)

    enc_ms = per_pass_seconds(enc_loop_builder(), 21) * 1e3
    results["encoders_fwd_bwd_ms"] = 2 * enc_ms  # text + audio

    # fused bidirectional recurrence alone (train mode, fwd+bwd)
    cell = MARNCellOnlySP()
    xl = jax.random.normal(jax.random.PRNGKey(4), (L, B, 100))
    qm = jnp.asarray(batch["qmask"])
    cp = cell.init({"params": key, "dropout": key}, xl, xl, qm,
                   True, mode="gather")["params"]

    def scan_loop_builder(train: bool, drop=0.5, attn_drop=0.2):
        import functools

        step_dir = functools.partial(
            _train_step_dir, dropout_rate=drop, attn_dropout=attn_drop)

        def run(p, xl_in, rng):
            seqs, consts = cell.apply({"params": p}, xl_in, xl_in, qm, True,
                                      mode="gather")
            seqs2 = jax.tree_util.tree_map(
                lambda a: jnp.stack([a, a], axis=1), seqs)
            consts2 = jax.tree_util.tree_map(
                lambda a: jnp.stack([a, a]), consts)
            z2 = lambda *s: jnp.zeros((2,) + s, xl_in.dtype)
            init = (z2(B, 128), z2(B, 128), z2(B, 128), z2(B, 128),
                    z2(B, 128), z2(B, 2, 128))
            if train:
                keys = jax.random.split(rng, (L, 2))
                seqs2 = seqs2 + (keys,)

                def raw(carry, xs):
                    return jax.vmap(step_dir, in_axes=(0, 0, 0))(
                        consts2, carry, xs)
                step = config.scan_remat(raw)
            else:
                from ser_tpu.models.marn_onlysp import _eval_step

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

    results["scan_fwd_ms"] = per_pass_seconds(scan_loop_builder(False), 21) * 1e3
    results["scan_fwd_bwd_ms"] = per_pass_seconds(scan_loop_builder(True), 11) * 1e3
    # ablations: isolate the cost of dropout-mask RNG inside the bwd scan
    results["scan_fwd_bwd_no_attn_drop_ms"] = per_pass_seconds(
        scan_loop_builder(True, attn_drop=0.0), 11) * 1e3
    results["scan_fwd_bwd_no_drop_ms"] = per_pass_seconds(
        scan_loop_builder(True, drop=0.0, attn_drop=0.0), 11) * 1e3

    results["backend"] = jax.default_backend()
    results["shape"] = [L, B]
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
