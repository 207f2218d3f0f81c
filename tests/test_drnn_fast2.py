"""DialogueRNN P==2 fast-path equivalence (config.DRNN_FAST2).

The fast path computes only the party-cell rows the qmask mix keeps
(ref ``model/DialogueRNN.py:139-152`` computes all B*P rows and discards
half); on valid (non-padded) steps the two paths are the same math, so
eval logits must agree to float-reassociation tolerance on valid rows.
Padded suffix steps are allowed to differ (documented in PARITY.md) but
must stay finite.
"""

import numpy as np
import pytest


@pytest.fixture()
def drnn_batch():
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(L=12, B=5, seed=3, min_len=4)
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}


def _logits(mode, batch):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)

    old = config.DRNN_FAST2
    config.DRNN_FAST2 = mode
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, *args, deterministic=True)
    finally:
        config.DRNN_FAST2 = old
    return np.asarray(spec.extract_logp(out))


def test_fast2_matches_generic_on_valid_rows(drnn_batch):
    generic = _logits(False, drnn_batch)
    fast = _logits(True, drnn_batch)
    valid = np.asarray(drnn_batch["umask"]).reshape(-1) > 0
    np.testing.assert_allclose(fast[valid], generic[valid],
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(fast).all()  # padded rows may differ but not blow up


def test_fast2_train_grads_finite(drnn_batch):
    import jax
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(drnn_batch)
    labels = drnn_batch["label"].reshape(-1)
    umask = drnn_batch["umask"]
    key = jax.random.PRNGKey(1)

    old = config.DRNN_FAST2
    config.DRNN_FAST2 = True
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, *args, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return masked_loss(spec.extract_logp(out), labels, umask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
    finally:
        config.DRNN_FAST2 = old

    assert jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.isfinite(leaf).all()
