"""Full-batch padding: all-masked rows must not poison the loss (NaN).

Regression test for DialogueRNN's general2 attention renormalization, which
divides by the mask sum (zero for padding-only rows that full-batch padding
introduces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec
from ser_tpu.train.losses import masked_loss


@pytest.mark.parametrize("name", ["DialogueRNN", "MARN1_onlysp", "MARN1_sps"])
def test_all_masked_row_keeps_loss_finite(name):
    L, B, C = 8, 3, 6
    batch = synthetic_batch(L=L, B=B, n_classes=C, seed=0)
    # make row 2 fully padded (what pad_batch_to_full produces)
    batch["umask"][2] = 0.0
    batch["label"][2] = 0
    batch["qmask"][:, 2] = 0.0
    for k in ("r1", "r2", "r3", "r4", "visuf", "acouf"):
        batch[k][:, 2] = 0.0
    dbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}

    spec = get_model_spec(name)
    model = spec.build(C, "IEMOCAP")
    args = spec.make_inputs(dbatch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]

    labels = dbatch["label"].reshape(-1)
    loss, grads = jax.value_and_grad(
        lambda p: masked_loss(
            spec.extract_logp(
                model.apply({"params": p}, *args, deterministic=True)),
            labels, dbatch["umask"])
    )(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax)
