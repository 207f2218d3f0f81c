"""DialogueRNN suite extras: shapes, finiteness, loss oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.models.dialogue_rnn_extras import (
    AVECModel,
    BiE2EModel,
    CNNFeatureExtractor,
    DailyDialogueModel,
    DialogueRNNModel,
    E2EModel,
)
from ser_tpu.train.losses import (
    masked_mse_loss,
    masked_nll_loss,
    unmasked_weighted_nll_loss,
)

L, B = 6, 3


def _uq(seed=0):
    rng = np.random.default_rng(seed)
    U = jnp.asarray(rng.standard_normal((L, B, 20)).astype(np.float32))
    sp = rng.integers(0, 2, size=(L, B))
    qmask = np.zeros((L, B, 2), dtype=np.float32)
    qmask[np.arange(L)[:, None], np.arange(B)[None, :], sp] = 1.0
    umask = jnp.ones((B, L), jnp.float32)
    return U, jnp.asarray(qmask), umask


def test_unidirectional_model():
    U, qmask, umask = _uq()
    for att_type in ("simple", "general", "general2"):
        m = DialogueRNNModel(20, 16, 16, 12, 10, n_classes=7,
                             context_attention=att_type)
        params = m.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        U, qmask, umask, deterministic=True)["params"]
        out = m.apply({"params": params}, U, qmask, umask, att2=True,
                      deterministic=True)
        assert out.shape == (L, B, 7)
        assert np.isfinite(np.asarray(out)).all()


def test_avec_model():
    U, qmask, _ = _uq(1)
    m = AVECModel(20, 16, 16, 12, 10)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    U, qmask, deterministic=True)["params"]
    out = m.apply({"params": params}, U, qmask, deterministic=True)
    assert out.shape == (B * L,)


def test_cnn_feature_extractor_masks_padding():
    rng = np.random.default_rng(2)
    W, V = 12, 50
    x = jnp.asarray(rng.integers(0, V, size=(L, B, W)))
    umask = np.ones((B, L), np.float32)
    umask[1, 3:] = 0.0
    m = CNNFeatureExtractor(vocab_size=V, embedding_dim=16, output_size=10,
                            filters=4)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    x, jnp.asarray(umask), deterministic=True)["params"]
    feats = m.apply({"params": params}, x, jnp.asarray(umask),
                    deterministic=True)
    assert feats.shape == (L, B, 10)
    assert np.all(np.asarray(feats)[3:, 1] == 0)  # masked utterances zeroed


def test_daily_dialogue_model():
    rng = np.random.default_rng(3)
    W, V = 10, 40
    x = jnp.asarray(rng.integers(0, V, size=(L, B, W)))
    _, qmask, umask = _uq(3)
    m = DailyDialogueModel(100, 16, 16, 12, 10, vocab_size=V, n_classes=7)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    x, qmask, umask, deterministic=True)["params"]
    log_prob, alpha, _, _ = m.apply({"params": params}, x, qmask, umask,
                                    deterministic=True)
    assert log_prob.shape == (L, B, 7)
    np.testing.assert_allclose(
        np.exp(np.asarray(log_prob)).sum(-1), 1.0, rtol=1e-4)


def test_e2e_models():
    rng = np.random.default_rng(4)
    W, V, D_emb = 7, 30, 12
    turns = [jnp.asarray(rng.integers(0, V, size=(W, B))) for _ in range(3)]
    word_emb = jnp.asarray(rng.standard_normal((V, D_emb)).astype(np.float32))

    m = E2EModel(D_emb, 16, 16, 12, 10, 8, n_classes=7)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    *turns, word_emb, deterministic=True)["params"]
    out = m.apply({"params": params}, *turns, word_emb, att2=True,
                  deterministic=True)
    assert out.shape == (B, 7)

    m2 = BiE2EModel(D_emb, 16, 16, 12, 10, 8, vocab_size=V, n_classes=7)
    params2 = m2.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      *turns, deterministic=True)["params"]
    out2 = m2.apply({"params": params2}, *turns, att2=True,
                    deterministic=True)
    assert out2.shape == (B, 7)


def test_extra_losses_match_torch():
    import torch

    rng = np.random.default_rng(5)
    N, C = 12, 5
    logp = np.log(rng.dirichlet(np.ones(C), size=N).astype(np.float32))
    target = rng.integers(0, C, N)
    mask = rng.integers(0, 2, N).astype(np.float32)
    mask[0] = 1.0
    weight = rng.uniform(0.5, 1.5, C).astype(np.float32)

    # MaskedNLLLoss with weight (DialogueRNN.py:517-537)
    lt = torch.nn.NLLLoss(weight=torch.tensor(weight), reduction="sum")(
        torch.tensor(logp) * torch.tensor(mask)[:, None],
        torch.tensor(target))
    lt = lt / (torch.tensor(weight)[torch.tensor(target)]
               * torch.tensor(mask)).sum()
    got = masked_nll_loss(jnp.asarray(logp), jnp.asarray(target),
                          jnp.asarray(mask), weight=jnp.asarray(weight))
    np.testing.assert_allclose(float(got), float(lt), rtol=1e-5)

    # MaskedMSELoss (DialogueRNN.py:539-552)
    pred = rng.standard_normal(N).astype(np.float32)
    tgt = rng.standard_normal(N).astype(np.float32)
    mt = torch.nn.MSELoss(reduction="sum")(
        torch.tensor(pred) * torch.tensor(mask), torch.tensor(tgt))
    mt = mt / torch.tensor(mask).sum()
    got = masked_mse_loss(jnp.asarray(pred), jnp.asarray(tgt),
                          jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(mt), rtol=1e-5)

    # UnMaskedWeightedNLLLoss (DialogueRNN.py:687-705)
    ut = torch.nn.NLLLoss(weight=torch.tensor(weight), reduction="sum")(
        torch.tensor(logp), torch.tensor(target))
    ut = ut / torch.tensor(weight)[torch.tensor(target)].sum()
    got = unmasked_weighted_nll_loss(
        jnp.asarray(logp), jnp.asarray(target), weight=jnp.asarray(weight))
    np.testing.assert_allclose(float(got), float(ut), rtol=1e-5)