"""DialogueRNN p-cell projection fusion equivalence (config.DRNN_PMERGE).

The chunked path's context vector c_ only ever feeds
``p_in = p_x + c_ @ pWih_c`` and both the online-softmax merge and the
projection are linear, so projecting the numerators off the critical path
(per-chunk past block, g-write time within the chunk) must reproduce the
baseline chunked logits up to float reassociation.
"""

import numpy as np
import pytest


@pytest.fixture()
def batch():
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch

    # L=40 engages the chunked path (config.drnn_chunk: chunk 16 at L>=32)
    b = synthetic_batch(L=40, B=4, seed=3, min_len=10)
    return {k: jnp.asarray(v) for k, v in b.items() if k != "vid"}


def _logits(batch, pmerge):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)

    old = config.DRNN_PMERGE
    config.DRNN_PMERGE = pmerge
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, *args, deterministic=True)
        return spec.extract_logp(out), params
    finally:
        config.DRNN_PMERGE = old


def test_pmerge_eval_matches_chunked_baseline(batch):
    from ser_tpu import config

    assert config.drnn_chunk(40)  # precondition: the chunked path is live
    ref, p_ref = _logits(batch, pmerge=False)
    got, p_got = _logits(batch, pmerge=True)
    import jax

    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_pmerge_train_grads_finite(batch):
    import jax

    from ser_tpu import config
    from ser_tpu.models.registry import get_model_spec
    from ser_tpu.train.losses import masked_loss

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    old = config.DRNN_PMERGE
    config.DRNN_PMERGE = True
    try:
        params = model.init({"params": key, "dropout": key}, *args,
                            deterministic=True)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, *args, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return masked_loss(spec.extract_logp(out), labels, umask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
    finally:
        config.DRNN_PMERGE = old

    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the p-cell input kernel must actually receive gradient
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    pkeys = [k for k in flat if "p_cell_ih" in k]
    assert pkeys and any(float(np.abs(np.asarray(flat[k])).max()) > 0
                         for k in pkeys)
