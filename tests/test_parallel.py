"""Data parallelism: DP training on an 8-device mesh == single-device math."""

import jax
import numpy as np
import pytest

from ser_tpu.data.loaders import get_loaders
from ser_tpu.data.synthetic import generate_iemocap_pickles
from ser_tpu.parallel.mesh import make_mesh
from ser_tpu.train.trainer import ModelTrainer


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_dp")
    fp = generate_iemocap_pickles(
        str(out), n_train=16, n_test=8, min_len=5, max_len=12, seed=9)
    return get_loaders(fp, dataset="IEMOCAP", batch_size=8, valid=0.25,
                       n_classes=6)


def test_mesh_has_8_devices():
    mesh = make_mesh(8, platform="cpu")
    assert mesh.shape["dp"] == 8


def test_dp_matches_single_device(loaders):
    """One DP train step == one single-device step (same loss, same params).

    NOTE: exact multi-epoch trajectories diverge slowly — sharding changes
    the float reduction order, and the recurrent scan amplifies ~1e-7
    reassociation noise chaotically — so the equivalence check is per-step.
    """
    train_loader, _, test_loader = loaders

    single = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None)
    mesh = make_mesh(8, platform="cpu")
    dp = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None,
                      mesh=mesh)

    import jax.numpy as jnp

    from ser_tpu.train.trainer import _device_batch

    batch = next(iter(train_loader))
    rng = jax.random.PRNGKey(7)
    lr = jnp.float32(1e-3)

    p_s, o_s, l_s = single._train_step(
        single.params, single.opt_state, _device_batch(batch), lr, rng)
    p_d, o_d, l_d = dp._train_step(
        dp.params, dp.opt_state, _device_batch(batch, mesh), lr, rng)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_d)):
        # Adam's m/sqrt(v) amplifies ~1e-5 reassociation-level grad noise up
        # to lr-scale for near-zero-gradient entries; 2e-3 is still two
        # orders below parameter scale.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-3)

    # Eval path: identical params on both paths must give identical metrics.
    # (Comparing after independently-trained steps is argmax-unstable: the
    # recurrent forward amplifies the ~1e-4 Adam-step noise into logit
    # differences near tied early-training logits.)
    from ser_tpu.parallel.mesh import replicate_params

    single.params = p_s
    dp.params = replicate_params(p_s, mesh)
    acc_s, f1_s, _ = single.eval_network(test_loader, dump_csv=False)
    acc_d, f1_d, _ = dp.eval_network(test_loader, dump_csv=False)
    assert acc_s == acc_d
    assert f1_s == f1_d


@pytest.mark.parametrize("model_name", ["MARN1_sps", "DialogueRNN",
                                        "DialogueRNN-fast2"])
def test_dp_matches_single_device_risky_ops(loaders, model_name, monkeypatch):
    """Per-step DP == single for the models whose ops are most at risk under
    SPMD partitioning: sps's argsort compaction + slot permutation,
    DialogueRNN's dynamic-slice g_hist buffer (VERDICT r1 weak #5), and the
    P==2 party-cell fast path's one-hot select/scatter algebra (forced on —
    the auto gate would keep it off at this small batch)."""
    from ser_tpu import config

    train_loader, _, _ = loaders

    if model_name == "DialogueRNN-fast2":
        model_name = "DialogueRNN"
        monkeypatch.setattr(config, "DRNN_FAST2", True)

    single = ModelTrainer(model=model_name, seed=111, res_csv_path=None)
    mesh = make_mesh(8, platform="cpu")
    dp = ModelTrainer(model=model_name, seed=111, res_csv_path=None,
                      mesh=mesh)

    import jax.numpy as jnp

    from ser_tpu.train.trainer import _device_batch

    batch = next(iter(train_loader))
    rng = jax.random.PRNGKey(7)
    lr = jnp.float32(1e-3)

    p_s, o_s, l_s = single._train_step(
        single.params, single.opt_state, _device_batch(batch), lr, rng)
    p_d, o_d, l_d = dp._train_step(
        dp.params, dp.opt_state, _device_batch(batch, mesh), lr, rng)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-3)


def test_batch_actually_sharded(loaders):
    train_loader, _, _ = loaders
    mesh = make_mesh(8, platform="cpu")
    from ser_tpu.train.trainer import _device_batch

    batch = next(iter(train_loader))
    dbatch = _device_batch(batch, mesh)
    sh = dbatch["r1"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "dp")
    assert len(dbatch["r1"].devices()) == 8
    assert dbatch["umask"].sharding.spec == jax.sharding.PartitionSpec("dp")
