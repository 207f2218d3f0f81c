"""MaskedLoss / InfoNCE vs torch oracles; metrics vs sklearn."""

import jax.numpy as jnp
import numpy as np

from ser_tpu.train.losses import info_nce, masked_loss
from ser_tpu.train.metrics import weighted_accuracy, weighted_f1


def test_masked_loss_matches_torch_crossentropy():
    import torch

    rng = np.random.default_rng(0)
    B, L, C = 3, 7, 6
    logp = np.log(
        rng.dirichlet(np.ones(C), size=B * L).astype(np.float32)
    )  # model emits log-probs
    target = rng.integers(0, C, size=B * L)
    lengths = np.array([7, 4, 2])
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)

    # torch oracle: the reference MaskedLoss with CrossEntropyLoss
    # (loss.py:6-25) — double log-softmax included.
    pred_t = torch.tensor(logp) * torch.tensor(mask).reshape(-1, 1)
    loss_t = torch.nn.CrossEntropyLoss(reduction="sum")(
        pred_t, torch.tensor(target)
    ) / torch.tensor(mask).sum()

    got = masked_loss(jnp.asarray(logp), jnp.asarray(target), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(loss_t), rtol=1e-5)


def test_masked_loss_nll_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    N, C = 20, 6
    logp = np.log(rng.dirichlet(np.ones(C), size=N).astype(np.float32))
    target = rng.integers(0, C, size=N)
    mask = rng.integers(0, 2, size=N).astype(np.float32)
    mask[0] = 1.0

    pred_t = torch.tensor(logp) * torch.tensor(mask).reshape(-1, 1)
    loss_t = torch.nn.NLLLoss(reduction="sum")(
        pred_t, torch.tensor(target)
    ) / torch.tensor(mask).sum()

    got = masked_loss(
        jnp.asarray(logp), jnp.asarray(target), jnp.asarray(mask), kind="NLL"
    )
    np.testing.assert_allclose(float(got), float(loss_t), rtol=1e-5)


def test_masked_rows_have_zero_gradient():
    import jax

    rng = np.random.default_rng(2)
    N, C = 8, 6
    logits = rng.standard_normal((N, C)).astype(np.float32)
    target = rng.integers(0, C, size=N)
    mask = np.ones(N, dtype=np.float32)
    mask[3] = 0.0
    mask[6] = 0.0

    g = jax.grad(
        lambda p: masked_loss(p, jnp.asarray(target), jnp.asarray(mask))
    )(jnp.asarray(logits))
    g = np.asarray(g)
    np.testing.assert_allclose(g[3], 0.0, atol=1e-7)
    np.testing.assert_allclose(g[6], 0.0, atol=1e-7)
    assert np.abs(g[0]).max() > 0


def test_metrics_match_sklearn():
    from sklearn.metrics import accuracy_score, f1_score

    rng = np.random.default_rng(3)
    N = 500
    labels = rng.integers(0, 6, size=N)
    preds = rng.integers(0, 6, size=N)
    masks = rng.integers(0, 2, size=N).astype(np.float32)

    acc_sk = round(accuracy_score(labels, preds, sample_weight=masks) * 100, 2)
    f1_sk = round(
        f1_score(labels, preds, sample_weight=masks, average="weighted") * 100, 2
    )
    assert weighted_accuracy(labels, preds, masks) == acc_sk
    assert weighted_f1(labels, preds, masks) == f1_sk


def test_info_nce_matches_torch_reference_formula():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    N, M, D = 10, 7, 16
    q = rng.standard_normal((N, D)).astype(np.float32)
    pos = rng.standard_normal((N, D)).astype(np.float32)
    neg = rng.standard_normal((M, D)).astype(np.float32)

    # torch oracle implementing loss.py:78-133 'unpaired'
    qt = F.normalize(torch.tensor(q), dim=-1)
    pt = F.normalize(torch.tensor(pos), dim=-1)
    nt = F.normalize(torch.tensor(neg), dim=-1)
    pos_logit = torch.sum(qt * pt, dim=1, keepdim=True)
    neg_logits = qt @ nt.T
    logits = torch.cat([pos_logit, neg_logits], dim=1)
    labels = torch.zeros(len(logits), dtype=torch.long)
    expected = F.cross_entropy(logits / 0.1, labels)

    got = info_nce(jnp.asarray(q), jnp.asarray(pos), jnp.asarray(neg))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4)
