"""ModelTrainer — the training/eval engine.

Rebuilds ``/root/reference/model_trainer.py:28-187`` TPU-first: the model
forward + masked loss + backward + Adam update is one jit-compiled function
(re-used across epochs; one compile per padded batch shape bucket), and eval
is a jit-compiled forward + argmax. Matches the reference surface:

- ``train_network(epoch, loader) -> (lr, avg_loss)``
- ``eval_network(loader) -> (acc, f1, {})`` + res.csv dump
- ``save_parameters(path)`` / tolerant ``load_parameters(path)``
- Adam(lr, coupled wd=2e-5) + StepLR(gamma=lr_decay, step per test_step)
- masked-loss bookkeeping identical to ``model_trainer.py:117-124``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec
from ser_tpu.train import checkpoint as ckpt
from ser_tpu.train.losses import masked_loss
from ser_tpu.train.metrics import weighted_accuracy, weighted_f1
from ser_tpu.train.optim import step_lr, torch_adam

BATCH_ARRAY_KEYS = (
    "r1", "r2", "r3", "r4", "visuf", "acouf", "qmask", "umask", "label",
    "wav", "wav_len",
)


def _cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _device_batch(batch, mesh=None):
    arrays = {k: jnp.asarray(batch[k]) for k in BATCH_ARRAY_KEYS if k in batch}
    if mesh is not None:
        if "tp" in mesh.axis_names:
            from ser_tpu.parallel.tp import shard_batch_2d

            arrays = shard_batch_2d(arrays, mesh)
        else:
            from ser_tpu.parallel.mesh import shard_batch

            arrays = shard_batch(arrays, mesh)
    return arrays


class ModelTrainer:
    def __init__(
        self,
        device=None,
        lr=1e-3,
        test_step=1,
        lr_decay=0.98,
        model="MARN1_onlysp",
        loss="CrossEntropy",
        n_classes=6,
        dataset="IEMOCAP",
        seed=111,
        weight_decay=2e-5,
        res_csv_path="res.csv",
        mesh=None,
        audio_frontend=None,
        infonce=0.0,
        compute_dtype="f32",
        legacy_h_csv_path=None,
        **kwargs,
    ):
        del device, kwargs  # device selection is implicit (jax default)
        # Mixed-precision training (TPU-native, opt-in; reference is f32-only):
        # master params + Adam moments + loss stay float32, the forward and
        # backward run in bfloat16 (params/batch cast inside loss_fn, so the
        # cast's transpose returns float32 gradients). The measured payoff is
        # traffic-bound models — DialogueRNN's step is linear-in-B activation
        # traffic (PERF.md round-4 bound diagnosis: bf16 fwd 1.2-1.53x) —
        # while the logit-parity contract keeps "f32" the default.
        if compute_dtype not in ("f32", "bf16"):
            raise ValueError(
                f"compute_dtype must be 'f32' or 'bf16', got {compute_dtype!r}")
        self.compute_dtype = (
            jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32)
        self.spec = get_model_spec(model)
        self.model = self.spec.build(n_classes, dataset)
        self.loss_kind = loss
        self.n_classes = n_classes
        self.dataset = dataset
        self.res_csv_path = res_csv_path
        # Legacy `_n` trainer analysis artifact (model_trainer_n.py:134-135):
        # its eval loop dumps (trues, preds, masks) to h.csv — same data as
        # res.csv under the legacy column names/order. Opt-in.
        self.legacy_h_csv_path = legacy_h_csv_path
        self.mesh = mesh
        if audio_frontend is not None and not callable(audio_frontend):
            from ser_tpu.data.frontend import make_frontend

            audio_frontend = make_frontend(audio_frontend)
        self.audio_frontend = audio_frontend
        # InfoNCE auxiliary term: the reference constructs the loss as a
        # trainer member (model_trainer.py:79) with its use commented out
        # (:111-115); infonce > 0 enables that commented formulation with
        # the given weight.
        self.infonce = float(infonce)
        if self.infonce > 0 and not self.spec.feature_outputs:
            # keep the reference's quiet-no-op contract for models without
            # (logp, x_l, x_a) feature outputs — DialogueRNN's extra
            # outputs are attention maps, azs/mf/la return logp only
            print(f"[infonce] {model} has no modality-feature outputs; "
                  f"the InfoNCE term is skipped")

        # Init params from a tiny synthetic batch (shapes don't affect param
        # shapes; any L/B works).
        root = jax.random.PRNGKey(seed)
        init_rng, self.rng = jax.random.split(root)
        init_batch = _device_batch(synthetic_batch(L=8, B=2, n_classes=n_classes))
        args = self.spec.make_inputs(init_batch)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, *args, deterministic=True
        )
        self.params = variables["params"]

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        print(
            time.strftime("%m-%d %H:%M:%S")
            + " Model para number = %.2f" % (n_params / 1024 / 1024)
        )

        self.tx = torch_adam(weight_decay=weight_decay)
        self.opt_state = self.tx.init(self.params)
        self.lr_at = step_lr(lr, lr_decay, test_step)

        if mesh is not None and "tp" in mesh.axis_names:
            # 2-D (dp, tp) mesh (parallel/tp.py): batches sharded over 'dp',
            # weights sharded output-feature-wise over 'tp'; XLA's SPMD
            # partitioner inserts both the gradient psum over 'dp' and the
            # tensor-parallel collectives over 'tp'.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ser_tpu.parallel.tp import param_shardings, shard_params

            self.params = shard_params(self.params, mesh)
            self.opt_state = shard_params(self.opt_state, mesh)
            replicated = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                self._train_step_impl,
                donate_argnums=(0, 1),
                out_shardings=(
                    param_shardings(self.params, mesh),
                    param_shardings(self.opt_state, mesh),
                    replicated,
                ),
            )
            # predictions fully replicated so every process can fetch them
            # (multi-host eval: np.asarray needs an addressable array)
            self._eval_step = jax.jit(
                self._eval_step_impl, out_shardings=replicated)
        elif mesh is not None:
            # Data parallelism over dialogues (SURVEY §5.8): parameters and
            # optimizer state replicated, batches sharded over the 'dp' axis;
            # XLA's SPMD partitioner inserts the gradient all-reduce (psum)
            # over ICI automatically.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ser_tpu.parallel.mesh import replicate_params

            self.params = replicate_params(self.params, mesh)
            self.opt_state = replicate_params(self.opt_state, mesh)
            replicated = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                self._train_step_impl,
                donate_argnums=(0, 1),
                out_shardings=(replicated, replicated, replicated),
            )
            # predictions fully replicated so every process can fetch them
            # (multi-host eval: np.asarray needs an addressable array)
            self._eval_step = jax.jit(
                self._eval_step_impl, out_shardings=replicated)
        else:
            self._train_step = jax.jit(
                self._train_step_impl, donate_argnums=(0, 1))
            self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _forward(self, params, batch, deterministic, rng=None, raw=False):
        if self.audio_frontend is not None and "wav" in batch:
            # on-device raw-audio front-end: compute the 100-d audio slot
            # inside the jitted step (fused MFCC kernel, ops/pallas/mfcc.py)
            batch = dict(batch, acouf=self.audio_frontend(
                batch["wav"], batch.get("wav_len")))
        args = self.spec.make_inputs(batch)
        rngs = None if deterministic else {"dropout": rng}
        out = self.model.apply(
            {"params": params}, *args, deterministic=deterministic, rngs=rngs
        )
        return out if raw else self.spec.extract_logp(out)

    def _flat_targets(self, batch):
        """labels/mask flattened to match the model's logp row layout."""
        if self.spec.logp_layout == "tb":  # time-major rows (MARN_AT/ATV)
            return batch["label"].T.reshape(-1), batch["umask"].T
        return batch["label"].reshape(-1), batch["umask"]

    def _train_step_impl(self, params, opt_state, batch, lr, rng):
        labels, umask = self._flat_targets(batch)

        def loss_fn(p):
            if self.compute_dtype != jnp.float32:
                # bf16 compute: cast params + float batch arrays going in;
                # the loss below is computed on float32-cast logits so the
                # masked double-log-softmax keeps its f32 semantics.
                p = _cast_floats(p, self.compute_dtype)
                fwd_batch = _cast_floats(batch, self.compute_dtype)
            else:
                fwd_batch = batch
            out = self._forward(p, fwd_batch, deterministic=False, rng=rng,
                                raw=True)
            out = _cast_floats(out, jnp.float32)
            logp = self.spec.extract_logp(out)
            loss = masked_loss(logp, labels, umask, kind=self.loss_kind)
            if self.infonce > 0 and self.spec.feature_outputs:
                # the reference's commented formulation
                # (model_trainer.py:111-115): flatten the per-dialogue
                # feature sequences, query/positive = out[1], negatives =
                # out[2], unpaired mode.
                from ser_tpu.train.losses import info_nce

                b = out[1].shape[1]
                q = jnp.swapaxes(out[1], 0, 1).reshape(b, -1)
                neg = jnp.swapaxes(out[2], 0, 1).reshape(b, -1)
                loss = loss + self.infonce * info_nce(
                    q, q, neg, negative_mode="unpaired")
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _eval_step_impl(self, params, batch):
        import contextlib

        from ser_tpu import config

        # SPMD eval: force the scan recurrence — the ONLYSP_STACKED Pallas
        # fast path is a single-device kernel the partitioner cannot shard
        # (read at trace time; math-identical).
        ctx = (config.force_scan() if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            logp = self._forward(params, batch, deterministic=True)
        return jnp.argmax(logp, axis=1)

    # ------------------------------------------------------------------
    def train_network(self, epoch, loader):
        lr = self.lr_at(epoch)
        losses, mask_sums = [], []
        for batch in loader:
            dbatch = _device_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, dbatch, jnp.float32(lr), step_rng
            )
            # multi-process loaders carry the global mask separately (the
            # device loss is already the global masked average)
            msum = float(np.sum(batch.get("umask_global", batch["umask"])))
            # keep the loss as a device array until the epoch ends: a
            # float() here would sync the (expensive) relay round-trip per
            # step and stall the dispatch pipeline
            losses.append((loss, msum))
            mask_sums.append(msum)
        avg_loss = round(
            float(np.sum([float(l) * m for l, m in losses])
                  / np.sum(mask_sums)), 4)
        return lr, avg_loss

    def eval_network(self, loader, dump_csv=True):
        preds, labels, masks = [], [], []
        for batch in loader:
            dbatch = _device_batch(batch, self.mesh)
            # defer the device->host fetch to the end of the loop so batch
            # dispatch pipelines (per-batch np.asarray would sync the relay
            # round-trip every step)
            preds.append(self._eval_step(self.params, dbatch))
            # predictions are global (replicated out_sharding); pair them
            # with the global labels/masks on multi-process loaders
            label = batch.get("label_global", batch["label"])
            umask = batch.get("umask_global", batch["umask"])
            if self.spec.logp_layout == "tb":
                labels.append(np.asarray(label).T.reshape(-1))
                masks.append(np.asarray(umask).T.reshape(-1))
            else:
                labels.append(np.asarray(label).reshape(-1))
                masks.append(np.asarray(umask).reshape(-1))
        if not preds:
            # empty loader (e.g. valid split rounds to zero dialogues) —
            # report zero metrics instead of crashing the epoch loop
            return 0.0, 0.0, {}
        preds = np.concatenate(preds)
        labels = np.concatenate(labels)
        masks = np.concatenate(masks)

        if dump_csv and self.res_csv_path and jax.process_index() == 0:
            import pandas as pd

            pd.DataFrame(
                {"preds": preds, "labels": labels, "masks": masks}
            ).to_csv(self.res_csv_path, index=False)
            if self.legacy_h_csv_path:
                # legacy `_n` column layout (model_trainer_n.py:133-135)
                pd.DataFrame(
                    {"trues": labels, "preds": preds, "masks": masks}
                ).to_csv(self.legacy_h_csv_path, sep=",", index=False)

        acc = weighted_accuracy(labels, preds, masks)
        f1 = weighted_f1(labels, preds, masks)
        return acc, f1, {}

    def fusion_weights(self):
        """Learned scalar fusion weights, when the model has them.

        The reference tracked these into parameters.csv (train.py:71,80-81;
        producer vestigial at model_trainer.py:160-167). Returns e.g.
        {'w': ..., 'v': ..., 'v1': ..., 'v2': ...} or softmax'd 'p' weights;
        empty dict for models without scalar fusion."""
        out = {}
        for name in ("w", "v", "v1", "v2", "w1", "w2"):
            if name in self.params:
                arr = np.asarray(self.params[name]).reshape(-1)
                out[name] = float(arr[0]) if arr.size == 1 else arr.tolist()
        if "p" in self.params:
            p = np.asarray(self.params["p"])
            sm = np.exp(p) / np.exp(p).sum()
            out["p"] = sm.tolist()
        return out

    # ------------------------------------------------------------------
    def save_parameters(self, path):
        ckpt.save_parameters(self.params, path)

    def save_train_state(self, path, epoch):
        """Exact-resume checkpoint: params + Adam m/v/count + epoch + the
        dropout key stream position (reference saves params only)."""
        ckpt.save_train_state(
            path, self.params, self.opt_state,
            {"epoch": int(epoch),
             "rng": np.asarray(self.rng)})  # legacy uint32[2] key

    def load_train_state(self, path):
        """Restore an exact-resume checkpoint; returns the saved epoch."""
        self.params, self.opt_state, extra = ckpt.load_train_state(
            path, self.params, self.opt_state)
        if self.mesh is not None:
            # re-place with the SAME shardings __init__ chose — replicating
            # on a (dp, tp) mesh would silently discard the tensor-parallel
            # weight shardings and defeat buffer donation on every resumed
            # step
            if "tp" in self.mesh.axis_names:
                from ser_tpu.parallel.tp import shard_params

                self.params = shard_params(self.params, self.mesh)
                self.opt_state = shard_params(self.opt_state, self.mesh)
            else:
                from ser_tpu.parallel.mesh import replicate_params

                self.params = replicate_params(self.params, self.mesh)
                self.opt_state = replicate_params(self.opt_state, self.mesh)
        if "rng" in extra:
            self.rng = jnp.asarray(extra["rng"])
        return int(extra.get("epoch", 0))

    def export_parameters_torch(self, path):
        """Write current params as a reference-layout torch .model file
        (the reverse of ``load_parameters(torch_format=True)``)."""
        from ser_tpu.compat.torch_export import export_torch_checkpoint

        export_torch_checkpoint(self.params, path, self.spec.name)

    def load_parameters(self, path, torch_format=False):
        if torch_format:
            # A reference-framework checkpoint (torch.save of the trainer's
            # state_dict, model_trainer.py:170-171) — import with the same
            # tolerant partial-load semantics.
            from ser_tpu.compat.torch_import import import_torch_checkpoint

            self.params = import_torch_checkpoint(
                self.params, path, self.spec.name)
        else:
            self.params = ckpt.load_parameters(self.params, path)
        # Optimizer moments are intentionally not checkpointed, matching the
        # reference (model_trainer.py:170-171 saves the state_dict only).
        self.opt_state = self.tx.init(self.params)
