"""Tensor parallelism: (dp, tp) mesh forward == unsharded math.

XLA's SPMD partitioner owns the collectives; these tests pin down that the
shape-driven weight shardings in ``parallel/tp.py`` preserve the math on
an 8-device CPU mesh (dp=2 x tp=4) and that a full train step compiles
and runs with params sharded over 'tp'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec
from ser_tpu.parallel.tp import make_mesh_2d, shard_batch_2d, shard_params
from ser_tpu.train.losses import masked_loss
from ser_tpu.train.optim import torch_adam


def _build(model_name="MARN1_onlysp", L=12, B=8):
    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(L=L, B=B, n_classes=6, seed=3).items()
        if k != "vid"
    }
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, *args, deterministic=True)["params"]
    return spec, model, params, batch, args


import pytest


@pytest.mark.parametrize("model_name", [
    # flagship + the shapes most at risk under the shape-rule shardings:
    # nsps (LayerNorm'd seq attention + softmax-p fusion), sps (per-party
    # compaction), DialogueRNN (GRU trio + matchatt, D=500 sharded 4-way),
    # BiLSTM (cuDNN-layout bidirectional), MARN_ATV (time-major trimodal)
    "MARN1_onlysp", "MARN1_nsps", "MARN1_sps", "DialogueRNN", "BiLSTM",
    "MARN_ATV",
])
def test_tp_eval_matches_unsharded(model_name):
    mesh = make_mesh_2d(2, 4, platform="cpu")
    spec, model, params, batch, args = _build(model_name)

    def forward(p, *a):
        out = model.apply({"params": p}, *a, deterministic=True)
        return spec.extract_logp(out)

    ref = jax.jit(forward)(params, *args)

    p_sharded = shard_params(params, mesh)
    sharded_batch = shard_batch_2d(batch, mesh)
    sharded_args = spec.make_inputs(sharded_batch)
    with mesh:
        tp_out = jax.jit(forward)(p_sharded, *sharded_args)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(tp_out), rtol=2e-5, atol=1e-6)


def test_tp_train_step_runs():
    mesh = make_mesh_2d(2, 4, platform="cpu")
    spec, model, params, batch, args = _build()

    tx = torch_adam()
    opt_state = tx.init(params)
    labels, umask = batch["label"].reshape(-1), batch["umask"]

    def train_step(p, o, b, rng):
        margs = spec.make_inputs(b)

        def loss_fn(pp):
            out = model.apply(
                {"params": pp}, *margs, deterministic=False,
                rngs={"dropout": rng})
            return masked_loss(spec.extract_logp(out), labels, umask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        o.hyperparams["learning_rate"] = jnp.float32(1e-3)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_sharded = shard_params(params, mesh)
    o_sharded = shard_params(opt_state, mesh)
    sharded_batch = shard_batch_2d(batch, mesh)
    with mesh:
        new_p, new_o, loss = jax.jit(train_step)(
            p_sharded, o_sharded, sharded_batch, jax.random.PRNGKey(1))
        loss.block_until_ready()
    assert np.isfinite(float(loss))
    # params actually land sharded over tp (not silently replicated)
    leaves = [
        l for l in jax.tree_util.tree_leaves(new_p)
        if l.ndim == 2 and l.shape[1] % 4 == 0
    ]
    assert any(
        not l.sharding.is_fully_replicated for l in leaves
    ), "no 2-D kernel ended up tp-sharded"


def test_tp_trainer_matches_single_device():
    """One (dp=2, tp=4) train step through ModelTrainer == one single-device
    step (same loss; params close — see test_parallel.py for why per-step,
    not per-trajectory)."""
    from ser_tpu.train.trainer import ModelTrainer, _device_batch

    mesh = make_mesh_2d(2, 4, platform="cpu")
    single = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None)
    tp = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None,
                      mesh=mesh)

    batch = {
        k: np.asarray(v)
        for k, v in synthetic_batch(L=10, B=8, n_classes=6, seed=5).items()
        if k != "vid"
    }
    rng = jax.random.PRNGKey(7)
    lr = jnp.float32(1e-3)

    p_s, o_s, l_s = single._train_step(
        single.params, single.opt_state, _device_batch(batch), lr, rng)
    p_t, o_t, l_t = tp._train_step(
        tp.params, tp.opt_state, _device_batch(batch, mesh), lr, rng)

    np.testing.assert_allclose(float(l_s), float(l_t), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-3)


def test_tp_resume_preserves_weight_shardings(tmp_path):
    """load_train_state on a (dp, tp) mesh must re-place restored leaves
    with the tensor-parallel shardings __init__ chose — replicating them
    would defeat donation and hold the full model per device."""
    from jax.sharding import PartitionSpec as P

    from ser_tpu.train.trainer import ModelTrainer

    mesh = make_mesh_2d(2, 4, platform="cpu")
    t = ModelTrainer(model="MARN1_onlysp", seed=7, res_csv_path=None,
                     mesh=mesh)
    path = str(tmp_path / "tp.state")
    t.save_train_state(path, epoch=3)
    assert t.load_train_state(path) == 3

    specs = {leaf.sharding.spec
             for leaf in jax.tree_util.tree_leaves(t.params)
             if leaf.ndim == 2 and leaf.shape[1] % 4 == 0}
    assert P(None, "tp") in specs
