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


def cmd_export(args):
    from ser_tpu import config
    from ser_tpu.serving import save_model
    from ser_tpu.train.trainer import ModelTrainer

    config.ENCODER_ATTENTION = args.encoder_attention
    trainer = ModelTrainer(res_csv_path=None, **vars(args))
    trainer.load_parameters(args.initial_model,
                            torch_format=args.torch_format)
    save_model(args.out, args.model, trainer.params, args.L, args.B,
               n_classes=args.n_classes, dataset=args.dataset,
               platforms=tuple(args.platforms.split(",")))
    print(json.dumps({"artifact": args.out, "model": args.model,
                      "L": args.L, "B": args.B,
                      "platforms": args.platforms}))


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


def main(argv=None):
    p = argparse.ArgumentParser(description="ser_tpu AOT serving")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="checkpoint -> AOT artifact")
    pe.add_argument("--initial_model", type=str, required=True)
    pe.add_argument("--out", type=str, required=True)
    pe.add_argument("--model", type=str, default="MARN1_onlysp",
                    help=" / ".join(available_models()))
    pe.add_argument("--dataset", type=str, default="IEMOCAP")
    pe.add_argument("--n_classes", type=int, default=6)
    pe.add_argument("--L", type=int, default=110,
                    help="max dialogue length the artifact serves")
    pe.add_argument("--B", type=int, default=80,
                    help="max batch of dialogues the artifact serves")
    pe.add_argument("--seed", type=int, default=111)
    pe.add_argument("--platforms", type=str, default="tpu,cpu")
    pe.add_argument("--torch_format", action="store_true")
    pe.add_argument("--encoder_attention", type=str, default="mha")
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

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
