"""DialogueRNN chunked flash-attention equivalence (config.DRNN_CHUNK).

The chunked path (models/dialogue_rnn.py::_drnn_chunk_step) computes the
completed-chunk contribution to the g_hist context attention as per-chunk
matmuls merged with the within-chunk buffer by exact online-softmax — the
math equals the reference's per-step masked softmax (ref
``model/DialogueRNN.py:127-135``) up to float reassociation. Covers:
eval logits + alphas, train loss + full gradient, every context_attention
kind x fast2 setting, and a sequence length that is NOT a chunk multiple
(exercises the padded last chunk and the padded g_hist buffer).
"""

import numpy as np
import pytest


@pytest.fixture()
def drnn_batch():
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    # L=14 with chunk 4 -> K=4, L_pad=16: exercises the padded tail chunk
    batch = synthetic_batch(L=14, B=5, seed=3, min_len=4)
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}


def _run(chunk, batch, training=False):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)

    old = config.DRNN_CHUNK
    config.DRNN_CHUNK = chunk
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        if not training:
            out = model.apply({"params": params}, *args, deterministic=True)
            return out[0], out[1]

        labels = batch["label"].reshape(-1)
        umask = batch["umask"]

        def loss_fn(p):
            out = model.apply({"params": p}, *args, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return masked_loss(spec.extract_logp(out), labels, umask)

        return jax.value_and_grad(loss_fn)(params)
    finally:
        config.DRNN_CHUNK = old


def test_chunked_eval_matches_per_step(drnn_batch):
    logp_ref, alpha_ref = _run(None, drnn_batch)
    logp, alpha = _run(4, drnn_batch)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               atol=2e-5)
    assert np.isfinite(np.asarray(logp)).all()


def test_chunked_train_grads_match(drnn_batch):
    import jax

    loss_ref, g_ref = _run(None, drnn_batch, training=True)
    loss, g = _run(4, drnn_batch, training=True)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_chunked_production_combination():
    """The combination production actually runs — "auto" chunk 16 at
    L >= 32 — against per-step, at an L that is NOT a multiple of 16
    (L=33 -> K=3, L_pad=48: padded tail chunk + padded g_hist)."""
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.data.synthetic import synthetic_batch

    assert config.drnn_chunk(33) == 16  # pin the auto policy this test pins

    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(L=33, B=3, seed=11,
                                         min_len=8).items() if k != "vid"}
    logp_ref, alpha_ref = _run(None, batch)
    logp, alpha = _run("auto", batch)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp_ref),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               atol=5e-5)

    loss_ref, _ = _run(None, batch, training=True)
    loss, _ = _run("auto", batch, training=True)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)


@pytest.mark.parametrize("context_attention", ["general", "simple",
                                               "general2"])
@pytest.mark.parametrize("fast2", [False, True])
def test_chunked_all_attention_kinds(drnn_batch, context_attention, fast2):
    import jax
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.models.dialogue_rnn import BiModel
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("DialogueRNN")
    args = spec.make_inputs(drnn_batch)
    key = jax.random.PRNGKey(0)
    model = BiModel(D_m=712, D_g=48, D_p=48, D_e=32, D_h=32, n_classes=6,
                    listener_state=True, context_attention=context_attention,
                    dropout_rec=0.1, dropout=0.1)

    old_f2, old_ck = config.DRNN_FAST2, config.DRNN_CHUNK
    config.DRNN_FAST2 = fast2
    try:
        config.DRNN_CHUNK = None
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        ref = model.apply({"params": params}, *args, deterministic=True)
        config.DRNN_CHUNK = 4
        out = model.apply({"params": params}, *args, deterministic=True)
    finally:
        config.DRNN_FAST2, config.DRNN_CHUNK = old_f2, old_ck
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    assert all(bool(jnp.isfinite(x).all()) for x in out)
