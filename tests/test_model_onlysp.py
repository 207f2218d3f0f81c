"""MARN1_onlysp: shapes, determinism, gradient flow, recurrence semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec


@pytest.fixture(scope="module")
def model_and_params():
    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(L=12, B=3).items()
             if k != "vid"}
    args = spec.make_inputs(batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args,
        deterministic=True,
    )["params"]
    return spec, model, params, batch


def test_forward_shapes(model_and_params):
    spec, model, params, batch = model_and_params
    args = spec.make_inputs(batch)
    logp, x_l, x_a = model.apply({"params": params}, *args, deterministic=True)
    L, B = batch["r1"].shape[:2]
    assert logp.shape == (B * L, 6)
    assert x_l.shape == (L, B, 100) and x_a.shape == (L, B, 100)
    # rows are log-probs
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4
    )


def test_eval_deterministic(model_and_params):
    spec, model, params, batch = model_and_params
    args = spec.make_inputs(batch)
    a = model.apply({"params": params}, *args, deterministic=True)[0]
    b = model.apply({"params": params}, *args, deterministic=True)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_stochastic(model_and_params):
    spec, model, params, batch = model_and_params
    args = spec.make_inputs(batch)
    a = model.apply(
        {"params": params}, *args, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )[0]
    b = model.apply(
        {"params": params}, *args, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )[0]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_gradients_flow(model_and_params):
    spec, model, params, batch = model_and_params
    args = spec.make_inputs(batch)
    labels = batch["label"].reshape(-1)

    from ser_tpu.train.losses import masked_loss

    def loss_fn(p):
        logp, _, _ = model.apply({"params": p}, *args, deterministic=True)
        return masked_loss(logp, labels, batch["umask"])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    # deliberately-unused parity params get zero grads; everything else must
    # receive signal.
    unused_markers = ("lstm_q0", "lstm_q1", "lstm_s", "a2l_W", "l2a_Wv",
                      "linear", "fc")
    zero, nonzero = [], []
    for path, g in flat:
        name = "/".join(p.key for p in path)
        (zero if np.abs(np.asarray(g)).max() == 0 else nonzero).append(name)
    for name in zero:
        assert any(m in name for m in unused_markers), f"dead grad: {name}"
    assert any("marn_cell_f" in n for n in nonzero)
    assert any("encoder_l" in n for n in nonzero)
    assert any("crossatt_l2a_Wq" in n for n in nonzero)


def test_padding_invariance(model_and_params):
    """Valid-position outputs must not depend on tail padding length."""
    spec, model, params, _ = model_and_params
    b1 = synthetic_batch(L=10, B=2, seed=7, min_len=10)  # full length
    logp1 = model.apply(
        {"params": params}, *spec.make_inputs(
            {k: jnp.asarray(v) for k, v in b1.items() if k != "vid"}
        ), deterministic=True
    )[0]
    # same content padded to L=16
    b2 = {}
    for k in ("r1", "r2", "r3", "r4", "visuf", "acouf", "qmask"):
        pad = np.zeros((6,) + b1[k].shape[1:], dtype=np.float32)
        b2[k] = np.concatenate([b1[k], pad], axis=0)
    b2["umask"] = np.concatenate(
        [b1["umask"], np.zeros((2, 6), np.float32)], axis=1
    )
    b2["label"] = np.concatenate(
        [b1["label"], np.zeros((2, 6), np.int32)], axis=1
    )
    logp2 = model.apply(
        {"params": params}, *spec.make_inputs(
            {k: jnp.asarray(v) for k, v in b2.items()}
        ), deterministic=True
    )[0]

    l1 = np.asarray(logp1).reshape(2, 10, 6)
    l2 = np.asarray(logp2).reshape(2, 16, 6)
    # NOTE: the reference's sequence-level cross attention attends over
    # padded positions too (no mask — lsthm_onlysp.py:287-293), so exact
    # padding invariance does NOT hold there; we reproduce that behavior.
    # The recurrent halves ARE padding-invariant; overall logits stay close.
    np.testing.assert_allclose(l1, l2[:, :10], rtol=0.2, atol=0.5)
