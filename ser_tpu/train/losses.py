"""Loss functions — MaskedLoss and InfoNCE.

Rebuilds ``/root/reference/loss.py`` with identical semantics, including the
trained-behavior quirk: the models emit log-probabilities (``log_softmax``)
and the default ``--loss CrossEntropy`` path applies log-softmax *again*
inside the cross entropy (ref ``loss.py:11,21`` + ``train.py:117``).
Masked rows are zeroed before the loss (not excluded), so they contribute a
constant log(C) to the summed loss but exactly zero gradient — we preserve
that so reported loss values are comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_loss(pred, target, mask, kind: str = "CrossEntropy", weight=None):
    """MaskedLoss (ref ``loss.py:6-25``).

    Args:
      pred: [N, C] model outputs (log-probs for every model in the zoo).
      target: [N] int labels.
      mask: [B, L] (or [N]) utterance validity mask.
      kind: 'CrossEntropy' (applies log_softmax again, the default trained
        behavior) or 'NLL'.
      weight: optional [C] class weights.

    Returns:
      scalar loss = sum-reduced per-row loss / mask normalizer.
    """
    mask_ = mask.reshape(-1, 1)
    masked_pred = pred * mask_
    onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
    if kind == "CrossEntropy":
        rowloss = -jnp.sum(jax.nn.log_softmax(masked_pred, axis=-1) * onehot, -1)
    elif kind == "NLL":
        rowloss = -jnp.sum(masked_pred * onehot, axis=-1)
    else:
        raise ValueError(f"unknown loss kind: {kind}")

    if weight is None:
        return jnp.sum(rowloss) / jnp.sum(mask)
    w = weight[target]
    return jnp.sum(rowloss * w) / jnp.sum(w * mask_.reshape(-1))


def masked_nll_loss(pred, target, mask, weight=None):
    """MaskedNLLLoss (ref ``model/DialogueRNN.py:517-537``) — identical to
    masked_loss(kind='NLL')."""
    return masked_loss(pred, target, mask, kind="NLL", weight=weight)


def masked_mse_loss(pred, target, mask):
    """MaskedMSELoss (ref ``model/DialogueRNN.py:539-552``): pred/target/mask
    are flat [N]; sum((pred*mask - target)^2) / sum(mask)."""
    return jnp.sum(jnp.square(pred * mask - target)) / jnp.sum(mask)


def unmasked_weighted_nll_loss(pred, target, weight=None):
    """UnMaskedWeightedNLLLoss (ref ``model/DialogueRNN.py:687-705``).
    Note the reference quirk: with weight=None the loss is the raw SUM
    (no normalization)."""
    onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
    if weight is None:
        rowloss = -jnp.sum(pred * onehot, axis=-1)
        return jnp.sum(rowloss)
    w = weight[target]
    rowloss = -jnp.sum(pred * onehot, axis=-1) * w
    return jnp.sum(rowloss) / jnp.sum(w)


def info_nce(
    query,
    positive_key,
    negative_keys=None,
    temperature: float = 0.1,
    negative_mode: str = "unpaired",
    reduction: str = "mean",
):
    """InfoNCE contrastive loss (ref ``loss.py:28-141``).

    query/positive_key: [N, D]; negative_keys: [M, D] ('unpaired') or
    [N, M, D] ('paired'); None uses in-batch negatives (off-diagonal
    positives).
    """

    def _norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    query = _norm(query)
    positive_key = _norm(positive_key)
    if negative_keys is not None:
        negative_keys = _norm(negative_keys)
        positive_logit = jnp.sum(query * positive_key, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            negative_logits = query @ negative_keys.T  # [N, M]
        elif negative_mode == "paired":
            negative_logits = jnp.einsum("nd,nmd->nm", query, negative_keys)
        else:
            raise ValueError(f"unknown negative_mode: {negative_mode}")
        logits = jnp.concatenate([positive_logit, negative_logits], axis=1)
        labels = jnp.zeros(logits.shape[0], dtype=jnp.int32)
    else:
        logits = query @ positive_key.T
        labels = jnp.arange(logits.shape[0])

    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    losses = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
