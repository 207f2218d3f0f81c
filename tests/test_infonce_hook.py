"""--infonce trainer hook: the reference's commented-out auxiliary loss
(``model_trainer.py:79,111-115``) as an opt-in term."""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.train.trainer import ModelTrainer, _device_batch


def test_infonce_term_changes_loss_and_matches_formula():
    batch = _device_batch(synthetic_batch(L=6, B=3, seed=5))
    rng = jax.random.PRNGKey(3)
    lr = jnp.float32(1e-3)

    base = ModelTrainer(model="MARN1_onlysp", seed=111, res_csv_path=None)
    with_nce = ModelTrainer(model="MARN1_onlysp", seed=111,
                            res_csv_path=None, infonce=0.5)

    # compute the expected aux term BEFORE the train steps (the jitted step
    # donates its param buffers)
    from ser_tpu.train.losses import info_nce

    out = base._forward(base.params, batch, deterministic=False, rng=rng,
                        raw=True)
    b = out[1].shape[1]
    q = jnp.swapaxes(out[1], 0, 1).reshape(b, -1)
    neg = jnp.swapaxes(out[2], 0, 1).reshape(b, -1)
    aux = 0.5 * float(info_nce(q, q, neg, negative_mode="unpaired"))

    _, _, l0 = base._train_step(base.params, base.opt_state, batch, lr, rng)
    _, _, l1 = with_nce._train_step(
        with_nce.params, with_nce.opt_state, batch, lr, rng)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1) - float(l0), aux, rtol=1e-4,
                               atol=1e-5)


def test_infonce_skipped_for_single_output_models():
    batch = _device_batch(synthetic_batch(L=5, B=2, seed=6))
    rng = jax.random.PRNGKey(4)
    # MARN1_azs returns (logp,) only — the hook must no-op, not crash
    t = ModelTrainer(model="MARN1_azs", seed=111, res_csv_path=None,
                     infonce=1.0)
    _, _, loss = t._train_step(t.params, t.opt_state, batch,
                               jnp.float32(1e-3), rng)
    assert np.isfinite(float(loss))
