"""Serving CLI: export a checkpoint as an AOT StableHLO artifact, and run one.

The deployment path the reference lacks (its only inference is the eval
loop inside training): ``export`` bakes the trained params into a
serialized, multi-platform ``jax.export`` artifact that serves without
Flax tracing or model code recompilation; ``run`` loads an artifact and
evaluates a data split, printing the same metrics JSON as predict.py.

Usage:
    python serve.py export --initial_model exps/run/model/model_0080.model \
        --model MARN1_onlysp --out exps/run/model.ser [--L 110 --B 80]
    python serve.py run --artifact exps/run/model.ser --synthetic
"""

from __future__ import annotations

import argparse
import json

from ser_tpu.models.registry import available_models


def _int_list(s):
    """'80' -> [80]; '1,8,32,80' -> [1, 8, 32, 80] (shape buckets)."""
    return [int(x) for x in str(s).split(",") if x != ""]


def cmd_export(args):
    from ser_tpu import config
    from ser_tpu.serving import _as_buckets, save_model
    from ser_tpu.train.trainer import ModelTrainer

    config.ENCODER_ATTENTION = args.encoder_attention
    trainer = ModelTrainer(res_csv_path=None, **vars(args))
    trainer.load_parameters(args.initial_model,
                            torch_format=args.torch_format)
    Ls, Bs = _int_list(args.L), _int_list(args.B)
    save_model(args.out, args.model, trainer.params, Ls, Bs,
               n_classes=args.n_classes, dataset=args.dataset,
               platforms=tuple(args.platforms.split(",")),
               dtype=args.dtype)
    print(json.dumps({"artifact": args.out, "model": args.model,
                      "buckets": [list(lb) for lb in _as_buckets(Ls, Bs)],
                      "platforms": args.platforms, "dtype": args.dtype}))


def cmd_run(args):
    import numpy as np

    from ser_tpu.data.loaders import get_loaders
    from ser_tpu.serving import ServingModel
    from ser_tpu.train.metrics import weighted_accuracy, weighted_f1
    from ser_tpu.utils import seed_everything

    seed_everything(args.seed)
    served = ServingModel.load(args.artifact)
    h = served.header
    if args.synthetic:
        import tempfile

        from ser_tpu.data.synthetic import generate_iemocap_pickles

        args.feature_path = generate_iemocap_pickles(
            tempfile.mkdtemp(prefix="ser_tpu_serve_"), seed=args.seed)

    _, valid_loader, test_loader = get_loaders(
        args.feature_path, dataset=h["dataset"], valid=0.2,
        batch_size=h["B"], n_classes=h["n_classes"], seed=args.seed,
        roberta_path=args.roberta_path)
    loader = {"test": test_loader, "valid": valid_loader}[args.split]

    preds, labels, masks = [], [], []
    for batch in loader:
        out = served.predict(batch)
        preds.append(out["preds"].reshape(-1))
        labels.append(np.asarray(batch["label"]).reshape(-1))
        masks.append(np.asarray(batch["umask"]).reshape(-1))
    preds, labels, masks = (np.concatenate(x) for x in (preds, labels,
                                                        masks))
    acc = weighted_accuracy(labels, preds, masks)
    f1 = weighted_f1(labels, preds, masks)
    print(json.dumps({
        "artifact": args.artifact,
        "model": h["model"],
        "split": args.split,
        "n_utterances": int(masks.sum()),
        "weighted_accuracy": acc,
        "weighted_f1": f1,
    }, indent=2))


def cmd_bench(args):
    """Per-bucket serving latency (the artifact's latency story).

    Methodology matches bench.py: the relay backend's block_until_ready is
    a no-op, so each bucket's exported call is chained K times on-device
    inside a jitted fori_loop with a tiny data dependency; per-call
    latency = (t_K - t_1)/(K - 1), min of 3 windows."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.serving import ServingModel

    served = ServingModel.load(args.artifact)
    h = served.header
    rows = {}
    for (L, B) in served.buckets:
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_batch(L=L, B=B,
                                 n_classes=h["n_classes"]).items()
                 if k != "vid"}
        fargs = served._make_inputs(batch)
        exported = served._exported[(L, B)]

        # v3 artifacts take the weights as the callable's first argument.
        # The timing loop must pass them as a jit ARGUMENT too — closing
        # over them would re-bake them as program constants, which is the
        # exact pathology v3 removes (XLA compiles the DialogueRNN scan
        # ~9x slower at B=1 with weights as constants; PERF.md).
        p = served.device_params()

        def loop(p, x, rest, k):
            def body(i, acc):
                if p is None:
                    out = exported.call(x + 1e-30 * acc, *rest)
                else:
                    out = exported.call(p, x + 1e-30 * acc, *rest)
                return jnp.sum(out)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        lj = jax.jit(loop, static_argnums=3)
        float(lj(p, fargs[0], fargs[1:], 1))  # compile + warm
        iters = args.iters
        float(lj(p, fargs[0], fargs[1:], iters + 1))  # warm the long k
        tl, ts = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(lj(p, fargs[0], fargs[1:], iters + 1))
            tl.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            float(lj(p, fargs[0], fargs[1:], 1))
            ts.append(time.perf_counter() - t0)
        sec = max((min(tl) - min(ts)) / iters, 1e-9)
        n_utts = float(np.sum(np.asarray(batch["umask"])))
        rows[f"L{L}_B{B}"] = {
            "ms_per_call": round(sec * 1e3, 3),
            "utterances_per_sec": round(n_utts / sec, 1),
        }
    print(json.dumps({"artifact": args.artifact, "model": h["model"],
                      "backend": jax.default_backend(),
                      "buckets": rows}, indent=2))


def cmd_stream(args):
    """Stateful streaming session (unidirectional models; MARN1_newz).

    Appends one utterance at a time for O(1) serial work per utterance
    (vs the bucket path's O(L) full-dialogue recompute) under the CAUSAL
    encoder contract — see ser_tpu/streaming.py for why exact streaming is
    semantically impossible with the reference's bidirectional sequence
    encoders (that documentation covers the bidirectional-recurrence
    models too: their backward scan consumes future utterances, so full
    recompute is required there). Reports ms/new-utterance and the
    measured causal-vs-bidirectional drift on the driven dialogue."""
    import time

    import numpy as np

    from ser_tpu import config
    from ser_tpu.streaming import NewZStream
    from ser_tpu.train.trainer import ModelTrainer

    if args.model != "MARN1_newz":
        raise SystemExit(
            "stream supports the unidirectional MARN1_newz only; every "
            "other registry model is bidirectional (backward scan over the "
            "full dialogue) and must use the bucket path (serve.py run)")
    config.ENCODER_ATTENTION = "mha"
    trainer = ModelTrainer(model=args.model, n_classes=args.n_classes,
                           dataset=args.dataset, res_csv_path=None)
    if args.initial_model:
        trainer.load_parameters(args.initial_model,
                                torch_format=args.torch_format)

    rng = np.random.default_rng(args.seed)
    L = args.n_utts
    x = rng.standard_normal((L, 1124)).astype(np.float32)
    sp = rng.integers(0, 2, size=L)
    qmask = np.zeros((L, 2), dtype=np.float32)
    qmask[np.arange(L), sp] = 1.0

    stream = NewZStream(trainer.params, n_classes=args.n_classes,
                        max_len=max(L, args.max_len))
    stream.append(x[0], qmask[0])  # compile
    stream.reset()

    t_per = []
    logits = []
    for t in range(L):
        t0 = time.perf_counter()
        logits.append(stream.append(x[t], qmask[t]))
        t_per.append(time.perf_counter() - t0)
    logits = np.stack(logits)

    # drift vs the bidirectional (parity-path) batch forward
    import jax.numpy as jnp

    out, _, _ = trainer.model.apply(
        {"params": trainer.params}, jnp.asarray(x[:, None, :]),
        jnp.asarray(qmask[:, None, :]), deterministic=True)
    bi = np.asarray(out).reshape(1, L, args.n_classes)[0]

    print(json.dumps({
        "model": args.model,
        "n_utterances": L,
        "ms_per_new_utterance_median": round(
            float(np.median(t_per)) * 1e3, 3),
        "ms_per_new_utterance_p90": round(
            float(np.percentile(t_per, 90)) * 1e3, 3),
        "argmax_agreement_vs_bidirectional": round(
            float((logits.argmax(-1) == bi.argmax(-1)).mean()), 4),
        "max_logit_drift_vs_bidirectional": float(np.abs(logits - bi).max()),
        "contract": "equals MARN1NewZ(causal_encoder=True) batch forward "
                    "(tests/test_streaming.py)",
    }, indent=2))


def main(argv=None):
    import os

    if os.environ.get("SER_FORCE_CPU"):  # CPU smoke (tests / relay outage)
        import jax

        jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description="ser_tpu AOT serving")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="checkpoint -> AOT artifact")
    pe.add_argument("--initial_model", type=str, required=True)
    pe.add_argument("--out", type=str, required=True)
    pe.add_argument("--model", type=str, default="MARN1_onlysp",
                    help=" / ".join(available_models()))
    pe.add_argument("--dataset", type=str, default="IEMOCAP")
    pe.add_argument("--n_classes", type=int, default=6)
    pe.add_argument("--L", type=str, default="110",
                    help="dialogue-length bucket(s), comma-separated "
                         "(e.g. 110 or 32,110)")
    pe.add_argument("--B", type=str, default="1,8,32,80",
                    help="batch-size bucket(s), comma-separated; predict "
                         "picks the smallest admitting bucket")
    pe.add_argument("--seed", type=int, default=111)
    pe.add_argument("--platforms", type=str, default="tpu,cpu")
    pe.add_argument("--torch_format", action="store_true")
    pe.add_argument("--encoder_attention", type=str, default="mha")
    pe.add_argument("--dtype", type=str, default="f32",
                    choices=["f32", "bf16", "int8"],
                    help="deployment precision: bf16 = params baked bf16, "
                         "forward in bfloat16 (f32 in/out; measured "
                         "1.2-1.5x on DialogueRNN, PERF.md); int8 = "
                         "weights-only int8 storage (4x smaller), "
                         "dequantized to bf16 compute per call")
    pe.set_defaults(fn=cmd_export)

    pr = sub.add_parser("run", help="evaluate a split with an artifact")
    pr.add_argument("--artifact", type=str, required=True)
    pr.add_argument("--feature_path", type=str,
                    default="/home/workspaces/SMM22/features/")
    pr.add_argument("--roberta_path", type=str, default=None)
    pr.add_argument("--split", type=str, default="test",
                    choices=["test", "valid"])
    pr.add_argument("--seed", type=int, default=111)
    pr.add_argument("--synthetic", action="store_true")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="per-bucket serving latency")
    pb.add_argument("--artifact", type=str, required=True)
    pb.add_argument("--iters", type=int, default=50)
    pb.set_defaults(fn=cmd_bench)

    ps = sub.add_parser(
        "stream", help="stateful streaming session (MARN1_newz)")
    ps.add_argument("--initial_model", type=str, default=None)
    ps.add_argument("--model", type=str, default="MARN1_newz")
    ps.add_argument("--n_classes", type=int, default=6)
    ps.add_argument("--dataset", type=str, default="IEMOCAP")
    ps.add_argument("--n_utts", type=int, default=60,
                    help="dialogue length to drive")
    ps.add_argument("--max_len", type=int, default=128,
                    help="history capacity (static shape)")
    ps.add_argument("--seed", type=int, default=111)
    ps.add_argument("--torch_format", action="store_true")
    ps.set_defaults(fn=cmd_stream)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
