"""Per-model throughput benchmark across the zoo (eval and train).

Not run by the driver (bench.py is the canonical single-line benchmark);
this tool profiles any subset of the registry — eval at the IEMOCAP eval
shape, or (``--train``) the full train step (fwd+bwd+Adam) at the
reference train shape [L=110, B=80].

Usage:
    python bench_zoo.py [--models MARN1_onlysp DialogueRNN ...] [--iters 20]
    python bench_zoo.py --save baselines/zoo_r02.json     # record a baseline
    python bench_zoo.py --check baselines/zoo_r02.json    # diff vs baseline
    python bench_zoo.py --train --save baselines/zoo_train_r03.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from bench import iemocap_eval_batch, synthetic_like_train


def bench_model(name, batch, n_utts, iters=20):
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    dbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}
    args = spec.make_inputs(dbatch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]

    def loop(p, x, k):
        def body(i, acc):
            out = model.apply({"params": p}, x + 1e-30 * acc, *args[1:],
                              deterministic=True)
            return jnp.sum(spec.extract_logp(out))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    lj = jax.jit(loop, static_argnums=2)
    t0 = time.perf_counter()
    float(lj(params, args[0], 1))
    compile_s = time.perf_counter() - t0

    # Auto-scale the chained-iteration count so the timed window is at
    # least ~150 ms: at iters=20 the fast models (<0.2 ms/pass) measure a
    # ~4 ms window that is dominated by relay/dispatch noise and swings
    # +-40% run to run (observed on MARN/BiLSTM), defeating the 20%
    # regression gate this tool exists for.
    float(lj(params, args[0], iters + 1))  # warm the new static k (retrace)
    t0 = time.perf_counter()
    float(lj(params, args[0], iters + 1))
    est = (time.perf_counter() - t0) / (iters + 1)
    iters = max(iters, min(int(0.15 / max(est, 1e-7)), 2000))

    tl, ts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(lj(params, args[0], iters + 1))
        tl.append(time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        float(lj(params, args[0], 1))
        ts.append(time.perf_counter() - t0)
    sec = max((min(tl) - min(ts)) / iters, 1e-9)
    from ser_tpu.utils.flops import efficiency, jit_flops

    flops = jit_flops(
        lambda p, x: spec.extract_logp(model.apply(
            {"params": p}, x, *args[1:], deterministic=True)),
        params, args[0])
    return {
        "ms_per_pass": round(sec * 1e3, 3),
        "utterances_per_sec": round(n_utts / sec, 1),
        "compile_s": round(compile_s, 1),
        **efficiency(flops, sec),
    }


def bench_model_train(name, batch, n_utts, iters=10, compute_dtype=None):
    """Full train step (fwd+bwd+torch-Adam) per pass, trainer conventions:
    masked double-log-softmax loss, per-step dropout keys split on-device.

    ``compute_dtype=jnp.bfloat16`` measures the mixed-precision path
    (trainer.py --compute_dtype bf16: fwd+bwd in bf16, master state f32)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss
    from ser_tpu.train.optim import torch_adam
    from ser_tpu.train.trainer import _cast_floats

    spec = get_model_spec(name)
    n_classes = 7 if name == "MARN_AT" else 6
    model = spec.build(n_classes, "IEMOCAP")
    dbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}
    args = spec.make_inputs(dbatch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    if spec.logp_layout == "tb":  # time-major rows (MARN_AT/ATV)
        labels, umask = dbatch["label"].T.reshape(-1), dbatch["umask"].T
    else:
        labels, umask = dbatch["label"].reshape(-1), dbatch["umask"]
    tx = torch_adam()
    opt0 = tx.init(params)

    cast_args = (tuple(_cast_floats(a, compute_dtype) for a in args[1:])
                 if compute_dtype is not None else args[1:])

    def train_step(p, o, x, rng):
        def loss_fn(pp):
            if compute_dtype is not None:
                pp = _cast_floats(pp, compute_dtype)
                xx = _cast_floats(x, compute_dtype)
            else:
                xx = x
            out = model.apply({"params": pp}, xx, *cast_args,
                              deterministic=False, rngs={"dropout": rng})
            logp = spec.extract_logp(out).astype(jnp.float32)
            return masked_loss(logp, labels, umask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        o.hyperparams["learning_rate"] = jnp.float32(1e-3)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    def loop(p, o, x, rng, k):
        def body(i, carry):
            pp, oo, r = carry
            r, sub = jax.random.split(r)
            pp, oo, _ = train_step(pp, oo, x, sub)
            return (pp, oo, r)
        out = jax.lax.fori_loop(0, k, body, (p, o, rng))
        return sum(l.sum() for l in jax.tree_util.tree_leaves(out[0]))

    lj = jax.jit(loop, static_argnums=4)
    rng0 = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    float(lj(params, opt0, args[0], rng0, 1))
    compile_s = time.perf_counter() - t0

    float(lj(params, opt0, args[0], rng0, iters + 1))  # warm the long k
    t0 = time.perf_counter()
    float(lj(params, opt0, args[0], rng0, iters + 1))
    est = (time.perf_counter() - t0) / (iters + 1)
    iters = max(iters, min(int(0.3 / max(est, 1e-7)), 500))

    tl, ts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(lj(params, opt0, args[0], rng0, iters + 1))
        tl.append(time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        float(lj(params, opt0, args[0], rng0, 1))
        ts.append(time.perf_counter() - t0)
    sec = max((min(tl) - min(ts)) / iters, 1e-9)
    from ser_tpu.utils.flops import efficiency, jit_flops

    flops = jit_flops(
        lambda p, o, x: train_step(p, o, x, rng0)[2], params, opt0, args[0])
    return {
        "ms_per_step": round(sec * 1e3, 3),
        "utterances_per_sec": round(n_utts / sec, 1),
        "compile_s": round(compile_s, 1),
        **efficiency(flops, sec),
    }


def main():
    import os

    if os.environ.get("SER_FORCE_CPU"):  # CPU smoke (tests / relay outage)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ser_tpu.models.registry import available_models

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="*", default=None,
                   help="subset (default: all registered models)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--save", type=str, default=None,
                   help="write results JSON (per-model baseline for rounds)")
    p.add_argument("--check", type=str, default=None,
                   help="compare against a saved baseline; flag >10%% drops")
    p.add_argument("--check_threshold", type=float, default=0.9,
                   help="fail --check below this ratio (0.9 = 10%% drop; "
                        "PERF.md documents ±4–8%% host-load spread, so 0.9 "
                        "catches real regressions while tolerating noise)")
    p.add_argument("--train", action="store_true",
                   help="benchmark the full train step (fwd+bwd+Adam) at "
                        "the reference train shape [110, 80] instead of "
                        "the eval forward")
    p.add_argument("--dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="--train only: bf16 measures the mixed-precision "
                        "path (train.py --compute_dtype bf16). Don't gate "
                        "a bf16 run against an f32 baseline.")
    args = p.parse_args()

    if args.dtype == "bf16" and not args.train:
        raise SystemExit("--dtype bf16 applies to --train (eval bf16 is "
                         "the serving path: serve.py export --dtype bf16)")

    if args.train:
        import functools

        import jax.numpy as jnp

        batch = synthetic_like_train(seed=1)
        n_utts = int(np.sum(batch["umask"]))
        bench_fn = bench_model_train
        if args.dtype == "bf16":
            bench_fn = functools.partial(
                bench_model_train, compute_dtype=jnp.bfloat16)
        iters = max(1, args.iters // 2)
    else:
        batch, n_utts = iemocap_eval_batch()
        bench_fn = bench_model
        iters = args.iters
    results = {}
    for name in (args.models or available_models()):
        # One retry per model: the relay's remote_compile can fail
        # transiently on big backward compiles (observed on bench_zoo
        # --train over all 15 models); a retry removes the manual
        # re-run-and-merge step from the regression gate.
        for attempt in range(2):
            try:
                results[name] = bench_fn(name, batch, n_utts, iters)
                break
            except Exception as e:  # keep going; report the failure
                results[name] = {"error": f"{type(e).__name__}: {e}"}
                if attempt == 0:
                    print(json.dumps({name: results[name],
                                      "retrying": True}), flush=True)
        print(json.dumps({name: results[name]}), flush=True)

    if args.save:
        import jax

        with open(args.save, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "n_utterances": n_utts,
                       "dtype": args.dtype,
                       "models": results}, f, indent=2)
        print(f"saved baseline -> {args.save}")

    if args.check:
        with open(args.check) as f:
            base_doc = json.load(f)
        base = base_doc["models"]
        base_dtype = base_doc.get("dtype", "f32")
        if base_dtype != args.dtype:
            raise SystemExit(
                f"--check baseline {args.check} was recorded with dtype="
                f"{base_dtype} but this run uses --dtype {args.dtype}; "
                "gating across dtypes is meaningless (bf16 vs f32 differ "
                "by design). Use a matching baseline.")
        regressions = []
        for name, res in results.items():
            if "error" in res or "error" in base.get(name, {"error": 1}):
                continue
            ratio = res["utterances_per_sec"] / base[name][
                "utterances_per_sec"]
            flag = " REGRESSION" if ratio < args.check_threshold else ""
            print(f"{name}: {ratio:.2f}x vs baseline{flag}")
            if ratio < args.check_threshold:
                regressions.append(name)
        if regressions:
            raise SystemExit(f"throughput regressions: {regressions}")

    print(json.dumps({"all": results}, indent=2))


if __name__ == "__main__":
    main()
