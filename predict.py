"""Batch inference CLI — eval a checkpoint without the training loop.

Completes the product surface next to train.py: loads feature pickles (or
synthetic data), restores a checkpoint, runs the jit-compiled eval forward,
writes res.csv, and prints metrics + per-class breakdown as JSON.

Usage:
    python predict.py --initial_model exps/run/model/model_0080.model \
                      --feature_path /path/to/features/ [--model ...]
    python predict.py --synthetic --initial_model ...   # smoke mode
"""

from __future__ import annotations

import argparse
import json
import sys

from ser_tpu.data.loaders import get_loaders
from ser_tpu.models.registry import available_models
from ser_tpu.train.trainer import ModelTrainer
from ser_tpu.utils import seed_everything


def main(argv=None):
    p = argparse.ArgumentParser(description="SpeakerEmotionRecognition predict")
    p.add_argument("--initial_model", type=str, required=True)
    p.add_argument("--model", type=str, default="MARN1_onlysp",
                   help=" / ".join(available_models()))
    p.add_argument("--feature_path", type=str,
                   default="/home/workspaces/SMM22/features/")
    p.add_argument("--roberta_path", type=str, default=None)
    p.add_argument("--dataset", type=str, default="IEMOCAP")
    p.add_argument("--n_classes", type=int, default=6)
    p.add_argument("--batch_size", type=int, default=80)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--split", type=str, default="test",
                   choices=["test", "valid", "train"])
    p.add_argument("--res_csv", type=str, default="res.csv")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--audio_frontend", type=str, default="none",
                   help="none / mfcc — compute the 100-d audio slot "
                        "on-device from raw waveforms (mirrors train.py)")
    p.add_argument("--torch_format", action="store_true",
                   help="--initial_model is a reference PyTorch .model "
                        "checkpoint (imported via ser_tpu.compat)")
    p.add_argument("--encoder_attention", type=str, default="mha",
                   help="must match the flag the checkpoint was trained "
                        "with (train.py --encoder_attention): it changes "
                        "the encoder param tree, and the tolerant loader "
                        "would otherwise silently skip those weights")
    args = p.parse_args(argv)

    seed_everything(args.seed)
    from ser_tpu import config

    # set unconditionally (not just when != "mha"): the global is sticky,
    # and an in-process caller may have left a zoo kind configured
    config.ENCODER_ATTENTION = args.encoder_attention
    use_frontend = args.audio_frontend not in (None, "", "none")
    if args.synthetic:
        import tempfile

        from ser_tpu.data.synthetic import generate_iemocap_pickles

        args.feature_path = generate_iemocap_pickles(
            tempfile.mkdtemp(prefix="ser_tpu_predict_"), seed=args.seed,
            with_wav=use_frontend)

    train_loader, valid_loader, test_loader = get_loaders(
        args.feature_path, dataset=args.dataset, valid=0.2,
        batch_size=args.batch_size, n_classes=args.n_classes,
        seed=args.seed, roberta_path=args.roberta_path,
        wav_path="auto" if use_frontend else None)
    loader = {"test": test_loader, "valid": valid_loader,
              "train": train_loader}[args.split]

    trainer = ModelTrainer(res_csv_path=args.res_csv, **vars(args))
    trainer.load_parameters(args.initial_model,
                            torch_format=args.torch_format)
    acc, f1, _ = trainer.eval_network(loader)

    print(json.dumps({
        "model": args.model,
        "split": args.split,
        "n_examples": loader.num_examples(),
        "weighted_accuracy": acc,
        "weighted_f1": f1,
        "fusion_weights": trainer.fusion_weights(),
        "res_csv": args.res_csv,
    }, indent=2))


if __name__ == "__main__":
    main()
