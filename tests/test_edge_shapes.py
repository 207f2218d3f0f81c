"""Degenerate-shape robustness: L=1 / B=1 batches through forward + train.

Length-1 scans, mask-aware reversal of a single step, length bucketing of a
one-utterance dialogue, and single-dialogue batches are the classic breakage
points of recurrence rewrites; none of the reference-shaped tests hit them.
"""

import numpy as np
import pytest


def _batch(L, B, seed=0):
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    return {k: jnp.asarray(v) for k, v in
            synthetic_batch(L=L, B=B, seed=seed, min_len=1).items()
            if k != "vid"}


@pytest.mark.parametrize("model_name", ["MARN1_onlysp", "MARN1_sps",
                                        "DialogueRNN", "MARN_ATV"])
@pytest.mark.parametrize("L,B", [(1, 1), (1, 3), (4, 1)])
def test_forward_finite_at_degenerate_shapes(model_name, L, B):
    import jax

    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    batch = _batch(L, B)
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    logp = np.asarray(spec.extract_logp(
        model.apply({"params": params}, *args, deterministic=True)))
    assert logp.shape[0] == L * B
    assert np.isfinite(logp).all()


def test_train_step_at_L1_B1():
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    batch = _batch(1, 1)
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(1)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, *args, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return masked_loss(spec.extract_logp(out),
                           batch["label"].reshape(-1), batch["umask"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.isfinite(leaf).all()
