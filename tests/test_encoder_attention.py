"""The attention-zoo live surface: --encoder_attention swaps the encoder's
MHA for a catalog sequence op (config.ENCODER_ATTENTION)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu import config
from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec
from ser_tpu.ops.encoder_attention import SEQUENCE_KINDS


@pytest.fixture(autouse=True)
def _restore_config():
    yield
    config.ENCODER_ATTENTION = "mha"


def _flagship_forward(kind, seed=0):
    config.ENCODER_ATTENTION = kind
    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=8, B=2, seed=seed).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    logp = spec.extract_logp(
        model.apply({"params": params}, *args, deterministic=True))
    return params, np.asarray(logp)


@pytest.mark.parametrize("kind", [k for k in SEQUENCE_KINDS if k != "mha"])
def test_zoo_encoder_forward_finite(kind):
    params, logp = _flagship_forward(kind)
    assert np.isfinite(logp).all()
    # the swap actually happened: zoo op params live under slf_attn
    enc = params["encoder_l"]["slf_attn"]
    assert "op" in enc or "layer_norm" in enc
    assert "w_qs" not in enc  # the MHA projections are gone


def test_zoo_encoder_changes_the_math():
    _, base = _flagship_forward("mha")
    _, ext = _flagship_forward("external")
    assert not np.allclose(base, ext)


def test_zoo_encoder_checkpoint_roundtrip(tmp_path):
    """Params under a zoo encoder save/load through the standard
    checkpoint path (different param tree than mha — names must agree
    between two independently-built trainers)."""
    import numpy as np

    from ser_tpu.train.trainer import ModelTrainer

    config.ENCODER_ATTENTION = "external"
    a = ModelTrainer(model="MARN1_onlysp", seed=3, res_csv_path=None)
    path = str(tmp_path / "zoo.model")
    a.save_parameters(path)
    b = ModelTrainer(model="MARN1_onlysp", seed=4, res_csv_path=None)
    warnings = []
    from ser_tpu.train import checkpoint as ckpt

    b.params = ckpt.load_parameters(b.params, path, log=warnings.append)
    assert not warnings, warnings
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_predict_cli_honors_encoder_attention(tmp_path, capsys):
    """predict.py --encoder_attention must rebuild the SAME param tree the
    checkpoint was trained with; without the flag the tolerant loader
    silently skips every zoo-encoder weight and evaluates garbage."""
    import json

    import predict
    from ser_tpu.train.trainer import ModelTrainer

    config.ENCODER_ATTENTION = "external"
    t = ModelTrainer(model="MARN1_onlysp", seed=3, res_csv_path=None)
    path = str(tmp_path / "zoo.model")
    t.save_parameters(path)
    config.ENCODER_ATTENTION = "mha"

    common = ["--initial_model", path, "--synthetic", "--batch_size", "8",
              "--res_csv", str(tmp_path / "res.csv")]
    predict.main(common + ["--encoder_attention", "external"])
    out = capsys.readouterr().out
    assert "is not in the model" not in out, out
    report = json.loads(out[out.index("{"):])
    assert np.isfinite(report["weighted_accuracy"])

    # sensitivity: the default-mha tree must NOT silently accept this
    # checkpoint (this is the failure mode the flag exists to prevent)
    predict.main(common)
    out = capsys.readouterr().out
    assert "is not in the model" in out


def test_zoo_encoder_trains():
    """One train step under the external-attention encoder: finite loss,
    every zoo-op parameter receives gradient."""
    from ser_tpu.train.losses import masked_loss

    config.ENCODER_ATTENTION = "external"
    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=8, B=2, seed=1).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(1)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, *args, deterministic=False,
                          rngs={"dropout": key})
        return masked_loss(spec.extract_logp(out),
                           batch["label"].reshape(-1), batch["umask"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    op_grads = grads["encoder_l"]["slf_attn"]["op"]
    for leaf in jax.tree_util.tree_leaves(op_grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # the external-attention memories mk/mv are actually learning
    assert float(jnp.abs(op_grads["mk"]).sum()) > 0
