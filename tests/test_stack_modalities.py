"""Modality-stacked variant steps equivalence (config.STACK_MODALITIES).

The sp/cf/azs per-step LSTHM chains are mutually independent within a step
(ref ``lsthm_sp.py:82-160``, ``lsthm_cf.py:103-204``, ``lsthm_azs.py:74-154``
— l and a read only carried state; in sp even the q chain does), so stacking
them on a leading modality axis (one batched einsum + one gate pass per step)
must reproduce the sequential-step logits exactly, forward AND backward.
The sp pad-slab construction (zero state x zero kernel rows) must contribute
exactly zero.
"""

import numpy as np
import pytest

MODELS = ["MARN1_sp", "MARN1_cf", "MARN1_azs", "MARN1_newz"]


@pytest.fixture()
def batch():
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    b = synthetic_batch(L=12, B=4, seed=5, min_len=4)
    return {k: jnp.asarray(v) for k, v in b.items() if k != "vid"}


def _build(name, batch, stacked):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)

    old = config.STACK_MODALITIES
    config.STACK_MODALITIES = stacked
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, *args, deterministic=True)
        return spec.extract_logp(out), params, spec, model, args
    finally:
        config.STACK_MODALITIES = old


@pytest.mark.parametrize("name", MODELS)
def test_stacked_eval_matches_sequential(name, batch):
    ref, p_ref, *_ = _build(name, batch, stacked=False)
    got, p_got, *_ = _build(name, batch, stacked=True)
    import jax

    # the gate must not change the parameter tree
    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name", MODELS)
def test_stacked_backward_matches_sequential(name, batch):
    """Gradient equivalence through the deterministic forward."""
    import jax
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    def grads(stacked):
        old = config.STACK_MODALITIES
        config.STACK_MODALITIES = stacked
        try:
            params = model.init({"params": key, "dropout": key}, *args,
                                deterministic=True)["params"]

            def loss_fn(p):
                out = model.apply({"params": p}, *args, deterministic=True)
                logp = spec.extract_logp(out)
                return masked_loss(logp, labels, umask)

            return jax.grad(loss_fn)(params)
        finally:
            config.STACK_MODALITIES = old

    g_ref = grads(False)
    g_got = grads(True)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("name", MODELS)
def test_stacked_train_step_finite(name, batch):
    """One stochastic (dropout-on) train step runs finite with the gate on."""
    import jax
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    old = config.STACK_MODALITIES
    config.STACK_MODALITIES = True
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, *args, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            logp = spec.extract_logp(out)
            return masked_loss(logp, labels, umask.reshape(-1, 1))

        loss, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree_util.tree_leaves(g))
    finally:
        config.STACK_MODALITIES = old
