"""Pair-batched post-recurrence tail equivalence (config.TAIL_PAIRED).

The paired path (ops/attention.py::paired_attention_tail) stacks the two
structurally identical attention chains of the MARN1_onlysp / MARN1_sps
head (ref ``model/lsthm_onlysp.py:287-293``) on a leading pair axis. The
pair members never interact, so eval logits must match the sequential
form exactly (up to batched-einsum float reassociation). Train mode uses
a different (distributionally identical) dropout stream — covered by a
finite-loss/finite-grad smoke instead of exact comparison.
"""

import numpy as np
import pytest


@pytest.fixture()
def batch():
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    b = synthetic_batch(L=12, B=5, seed=2, min_len=4)
    return {k: jnp.asarray(v) for k, v in b.items() if k != "vid"}


def _logits(model_name, batch, paired):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)

    old = config.TAIL_PAIRED
    config.TAIL_PAIRED = paired
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, *args, deterministic=True)
        return spec.extract_logp(out), params
    finally:
        config.TAIL_PAIRED = old


@pytest.mark.parametrize("model_name", ["MARN1_onlysp", "MARN1_sps"])
def test_paired_tail_eval_exact(model_name, batch):
    ref, p_ref = _logits(model_name, batch, paired=False)
    got, p_got = _logits(model_name, batch, paired=True)
    # identical param trees (the gather-mode declaration changes nothing)
    import jax

    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("model_name", ["MARN1_onlysp", "MARN1_sps"])
def test_paired_tail_train_grads_finite(model_name, batch):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    old = config.TAIL_PAIRED
    config.TAIL_PAIRED = True
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, *args, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(5)})
            return masked_loss(spec.extract_logp(out), labels, umask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
    finally:
        config.TAIL_PAIRED = old

    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the tail attention weights must actually receive gradient
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    keys = [k for k in flat if "crossatt_l2a" in k]
    assert keys and any(float(np.abs(np.asarray(flat[k])).max()) > 0
                        for k in keys)
