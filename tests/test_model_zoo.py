"""Zoo-wide checks: every registered model inits, runs, and trains.

Marked slow (15 models x init/forward/backward compiles dominates the
suite's wall-clock); the fast tier is ``pytest -m "not slow"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import available_models, get_model_spec
from ser_tpu.train.losses import masked_loss

pytestmark = pytest.mark.slow

L, B, C = 10, 3, 6

EXPECTED_MODELS = {
    "MARN1_onlysp", "MARN1_sp", "MARN1_sps", "MARN1_nsps", "MARN1_no_en",
    "MARN1_cf", "MARN1_mf", "MARN1_la", "MARN1_azs", "MARN1_newz",
    "BiLSTM", "DialogueRNN", "MARN", "MARN_AT", "MARN_ATV",
}


def test_registry_covers_reference_factory():
    # reference factory names (model_trainer.py:35-72) + the two MARN
    # attention variants whose classes exist but are unreachable there
    assert EXPECTED_MODELS <= set(available_models())


def _setup(name):
    spec = get_model_spec(name)
    model = spec.build(C, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, n_classes=C, seed=0).items()
             if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    return spec, model, params, batch, args


@pytest.mark.parametrize("name", sorted(EXPECTED_MODELS))
def test_forward_shapes_and_finite(name):
    spec, model, params, batch, args = _setup(name)
    out = model.apply({"params": params}, *args, deterministic=True)
    logp = spec.extract_logp(out)
    n_cls = 7 if name == "MARN_AT" else C
    assert logp.shape == (B * L, n_cls), logp.shape
    assert np.all(np.isfinite(np.asarray(logp)))


@pytest.mark.parametrize("name", sorted(EXPECTED_MODELS))
def test_train_mode_and_grads(name):
    spec, model, params, batch, args = _setup(name)
    if spec.logp_layout == "tb":
        labels = batch["label"].T.reshape(-1)
        umask = batch["umask"].T
    else:
        labels = batch["label"].reshape(-1)
        umask = batch["umask"]

    def loss_fn(p):
        out = model.apply({"params": p}, *args, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        return masked_loss(spec.extract_logp(out), labels, umask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


@pytest.mark.parametrize("name", ["MARN1_sps", "MARN1_nsps", "DialogueRNN"])
def test_eval_deterministic(name):
    spec, model, params, batch, args = _setup(name)
    a = spec.extract_logp(model.apply({"params": params}, *args,
                                      deterministic=True))
    b = spec.extract_logp(model.apply({"params": params}, *args,
                                      deterministic=True))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
