"""CLI experiment driver — TPU-native rebuild of ``/root/reference/train.py``.

Same flags, same epoch loop (train -> save -> eval every test_step epochs,
score.txt append with best-F1 tracking, parameters.csv dump), running on the
JAX default backend (TPU when present, CPU otherwise).

Extra flags over the reference:
  --synthetic       generate a synthetic IEMOCAP-shaped dataset on the fly
                    (no feature pickles required), useful for smoke runs.
  --roberta_path    where the COSMIC RoBERTa pickle lives (the reference
                    hard-codes an absolute path, ``dataloader.py:17-20``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import warnings
from collections import defaultdict

import numpy as np

if os.environ.get("SER_FORCE_CPU"):  # CPU smoke (tests / relay outage)
    import jax

    jax.config.update("jax_platforms", "cpu")

from ser_tpu.data.loaders import get_loaders
from ser_tpu.models.registry import available_models
from ser_tpu.train.trainer import ModelTrainer
from ser_tpu.utils import init_args, seed_everything

warnings.simplefilter("ignore")


def main(args):
    seed_everything(args.seed)

    if getattr(args, "encoder_attention", "mha") != "mha":
        from ser_tpu import config

        config.ENCODER_ATTENTION = args.encoder_attention
        print(f"Encoder self-attention: {args.encoder_attention} "
              "(attention-zoo surface)")

    if args.debug_nans:
        from ser_tpu.utils.profiling import enable_nan_checks

        enable_nan_checks(True)

    use_frontend = args.audio_frontend not in (None, "", "none")
    if args.synthetic:
        import tempfile

        from ser_tpu.data.synthetic import generate_iemocap_pickles

        tmp = tempfile.mkdtemp(prefix="ser_tpu_synth_")
        args.feature_path = generate_iemocap_pickles(
            tmp, seed=args.seed, with_wav=use_frontend)

    proc_kwargs = {}
    if args.dp or args.tp > 1:
        # multi-host bring-up (SURVEY §5.8): no-op on a single host; on a
        # multi-host slice each process loads only its rows of every global
        # batch (same-seed shuffle keeps batch composition identical to
        # single-process math) and shard_batch assembles the global arrays
        # via jax.make_array_from_process_local_data.
        import jax

        from ser_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
        if jax.process_count() > 1:
            proc_kwargs = dict(process_index=jax.process_index(),
                               process_count=jax.process_count())
            print(f"process {jax.process_index()}/{jax.process_count()}: "
                  f"loading {args.batch_size // jax.process_count()} of "
                  f"{args.batch_size} dialogues per batch")
    # On a multi-host slice every process runs the same computation (it
    # must — the collectives are collective), but only process 0 may touch
    # shared files: N concurrent writers to one checkpoint/score.txt on a
    # shared filesystem interleave and corrupt them. (res.csv is guarded
    # the same way inside trainer.eval_network.)
    primary = proc_kwargs.get("process_index", 0) == 0

    train_loader, valid_loader, test_loader = get_loaders(
        args.feature_path,
        dataset=args.dataset,
        valid=0.2,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        n_classes=args.n_classes,
        seed=args.seed,
        roberta_path=args.roberta_path,
        wav_path="auto" if use_frontend else None,
        **proc_kwargs,
    )
    if args.num_workers > 0:
        from ser_tpu.data.loaders import PrefetchLoader

        train_loader = PrefetchLoader(train_loader)
        test_loader = PrefetchLoader(test_loader)

    score_file = open(args.score_save_path, "a+") if primary else None
    if score_file:
        score_file.write(
            f"Model: {args.model} \nDataset : {args.dataset}\n"
            + "-" * 20 + "\n"
        )

    mesh = None
    if args.tp > 1:
        import jax

        from ser_tpu.parallel.tp import make_mesh_2d

        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide {n} devices")
        n_dp = n // args.tp
        if args.batch_size % max(n_dp, 1):
            raise SystemExit(
                f"--tp {args.tp} needs batch_size divisible by {n_dp} "
                "data-parallel ways")
        mesh = make_mesh_2d(n_dp, args.tp)
        print(f"2-D mesh: dp={n_dp} x tp={args.tp}")
    elif args.dp:
        import jax

        from ser_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        if n > 1:
            if args.batch_size % n:
                raise SystemExit(
                    f"--dp needs batch_size divisible by {n} devices")
            mesh = make_mesh(n)
            print(f"Data-parallel mesh over {n} devices")
        else:
            print("--dp requested but only one device present; running single")
    vars(args)["mesh"] = mesh

    if args.eval:
        s = ModelTrainer(**vars(args))
        print("Model %s loaded from previous state!" % args.initial_model)
        s.load_parameters(args.initial_model, torch_format=args.torch_format)
        if args.export_torch and primary:
            s.export_parameters_torch(args.export_torch)
            print(f"Exported reference-format checkpoint: {args.export_torch}")
        acc, fscore, _ = s.eval_network(test_loader)
        print(f"Acc {acc:.2f}, Fscore {fscore:.2f}")
        return

    trainer = ModelTrainer(**vars(args))
    if args.initial_model != "":
        print("Model %s loaded from previous state!" % args.initial_model)
        trainer.load_parameters(
            args.initial_model, torch_format=args.torch_format)

    start_epoch = 0
    resume_path = _resolve_resume(args.resume, args.model_save_path)
    if resume_path:
        start_epoch = trainer.load_train_state(resume_path)
        # replay the shuffle randomness the finished epochs consumed, so the
        # resumed run sees the same batch order the uninterrupted run would
        # (the .state file restores params/Adam/RNG but the loaders'
        # numpy Generators are freshly seeded at construction)
        train_loader.advance_epochs(start_epoch)
        valid_loader.advance_epochs(start_epoch)
        print(f"Train state {resume_path} resumed at epoch {start_epoch}!")

    fscores = []
    w_dic = defaultdict(list)
    for epoch in range(start_epoch + 1, args.epoch + 1):
        print("-" * 10, f"epoch {epoch} training", "-" * 10)
        lr, loss = trainer.train_network(epoch, train_loader)
        if epoch % args.test_step == 0:
            if primary:
                trainer.save_parameters(
                    args.model_save_path + "/model_%04d.model" % epoch
                )
                if args.save_state:
                    trainer.save_train_state(
                        args.model_save_path + "/last.state", epoch)
            acc, fscore, parame = trainer.eval_network(test_loader)
            # the reference's fusion-weight tracker is vestigial
            # (model_trainer.py:160-168 returns {}); we feed the same
            # pipeline from the live params so parameters.csv and
            # analysis.py's trajectory plot actually work.
            parame = dict(parame)
            for k, v in trainer.fusion_weights().items():
                parame.setdefault(k, v)
            for k, v in parame.items():
                w_dic[k].append(v)
            fscores.append(fscore)
            best_ep = (int(np.argmax(np.array(fscores))) + 1) * args.test_step
            line = (
                f"epoch {epoch}, Loss {loss:.2f}, Lr {lr:.6f}, "
                f"Acc {acc:.2f}, Fscore {fscore:.2f}, "
                f"Best Fscore: {max(fscores):.2f} [{best_ep}epoch]"
            )
            print(time.strftime("%Y-%m-%d %H:%M:%S"), line)
            if score_file:
                score_file.write(
                    time.strftime("%Y-%m-%d %H:%M:%S") + f" —— {line}\n"
                )
                score_file.flush()

    if args.export_torch and primary:
        trainer.export_parameters_torch(args.export_torch)
        print(f"Exported reference-format checkpoint: {args.export_torch}")

    if score_file:
        score_file.write("\n")
        score_file.close()

    if primary:
        import pandas as pd

        pd.DataFrame(w_dic).to_csv("parameters.csv", index=False)


def _resolve_resume(resume, model_save_path):
    """--resume 'latest' -> save_path's model/last.state when it exists,
    '' (fresh start) otherwise (restart-from-latest, SURVEY §5.3): with
    --save_state a preemption-safe loop is just
    ``while :; do python train.py --save_state --resume latest; done``."""
    if resume != "latest":
        return resume
    import os

    path = model_save_path + "/last.state"
    if not os.path.exists(path):
        print(f"--resume latest: no {path} yet; starting fresh")
        return ""
    return path


def parser_args(argv=None):
    parser = argparse.ArgumentParser(description="SpeakerEmotionRecognition (TPU)")
    parser.add_argument("--epoch", type=int, default=80)
    parser.add_argument("--batch_size", type=int, default=80)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--test_step", type=int, default=1)
    parser.add_argument("--eval", type=bool, default=False)
    parser.add_argument("--initial_model", type=str, default="")
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--lr_decay", type=float, default=0.98)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--loss", type=str, default="CrossEntropy",
                        help="CrossEntropy / NLL")
    parser.add_argument("--feature_path", type=str,
                        default="/home/workspaces/SMM22/features/")
    parser.add_argument("--roberta_path", type=str, default=None)
    parser.add_argument("--dataset", type=str, default="IEMOCAP",
                        help="IEMOCAP / MELD")
    parser.add_argument("--save_path", type=str, default="exps/MARN1_onlysp")
    parser.add_argument("--model", type=str, default="MARN1_onlysp",
                        help=" / ".join(available_models()))
    parser.add_argument("--n_classes", type=int, default=6)
    parser.add_argument("--gpu", type=int, default=0,
                        help="kept for CLI parity; device = jax default")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate synthetic IEMOCAP-shaped data")
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel over all visible devices")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel ways on a 2-D (dp, tp) mesh "
                             "(weights sharded over 'tp'; devices = dp*tp)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="raise on first NaN (jax_debug_nans)")
    parser.add_argument("--save_state", action="store_true",
                        help="also write model/last.state each test_step: "
                             "params + Adam moments + epoch + RNG stream "
                             "for exact resume (the reference saves params "
                             "only)")
    parser.add_argument("--resume", type=str, default="",
                        help="path to a .state file from --save_state, or "
                             "'latest' to auto-resume from save_path's "
                             "model/last.state when it exists (fresh start "
                             "otherwise — preemption-safe restart loops); "
                             "continues the run exactly where it stopped")
    parser.add_argument("--export_torch", type=str, default="",
                        help="after training (or after --eval load), also "
                             "write the params as a reference-layout torch "
                             ".model checkpoint the PyTorch stack can load")
    parser.add_argument("--torch_format", action="store_true",
                        help="--initial_model is a reference PyTorch "
                             ".model checkpoint (imported via ser_tpu.compat)")
    parser.add_argument("--infonce", type=float, default=0.0,
                        help="weight of the InfoNCE auxiliary loss (the "
                             "reference's commented-out term, "
                             "model_trainer.py:111-115); 0 disables")
    parser.add_argument("--encoder_attention", type=str, default="mha",
                        help="swap the EncoderLayer's multi-head attention "
                             "for an attention-zoo sequence op: mha / "
                             "external / self / simplified_self / "
                             "mobilevit_v2 / muse (the reference "
                             "imports ExternalAttention but never wires it; "
                             "here the catalog is live)")
    parser.add_argument("--compute_dtype", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="bf16 = mixed-precision training: forward + "
                             "backward in bfloat16, master params / Adam "
                             "moments / loss in float32 (reference parity "
                             "stays f32; eval always runs f32)")
    parser.add_argument("--audio_frontend", type=str, default="none",
                        help="none / mfcc — compute the 100-d audio slot "
                             "on-device from raw waveforms (fused MFCC "
                             "kernel) instead of precomputed features")
    args = parser.parse_args(argv)
    return init_args(args)


if __name__ == "__main__":
    args = parser_args()
    import jax

    print("Python Version:", sys.version)
    print("JAX Version:", jax.__version__)
    print("Devices:", jax.devices())
    print("Model:", args.model)
    print("Dataset", args.dataset)
    print("Save path:", args.save_path)

    st = time.time()
    main(args)
    print(f"training done, total {round(time.time() - st, 2)}s")
