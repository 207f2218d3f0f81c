"""Mixed-precision training (--compute_dtype bf16).

Opt-in TPU-native feature with no reference counterpart: the forward and
backward run in bfloat16 while the master params, Adam moments, and the
masked loss stay float32 (trainer.py::_train_step_impl casts inside loss_fn,
so the cast's transpose returns f32 gradients). The logit-parity contract is
untouched — "f32" stays the default and eval always runs f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.train.trainer import ModelTrainer


def _loader(n_batches=2, L=10, B=4, seed=0, poison_row=None):
    batches = []
    for i in range(n_batches):
        b = synthetic_batch(L=L, B=B, n_classes=6, seed=seed + i)
        if poison_row is not None:
            r = poison_row
            b["umask"][r] = 0.0
            b["label"][r] = 0
            b["qmask"][:, r] = 0.0
            for k in ("r1", "r2", "r3", "r4", "visuf", "acouf"):
                b[k][:, r] = 0.0
        batches.append({k: v for k, v in b.items() if k != "vid"})
    return batches


def _make(compute_dtype, tmp_path, model="MARN1_onlysp"):
    return ModelTrainer(
        model=model, n_classes=6, seed=111, compute_dtype=compute_dtype,
        res_csv_path=str(tmp_path / f"res_{compute_dtype}.csv"),
    )


def test_bf16_state_stays_f32_and_loss_tracks(tmp_path):
    """First step bf16 vs f32 from the same init: master state stays f32,
    the losses are close (bf16 rounding) but not bitwise equal (proof the
    cast actually happened). Single batch on purpose — the comparison must
    be per-step; epoch averages diverge chaotically once updates differ
    (same float-reassociation effect as DP-vs-single, test_parallel.py)."""
    loader = _loader(n_batches=1)
    t32 = _make("f32", tmp_path)
    t16 = _make("bf16", tmp_path)
    _, loss32 = t32.train_network(1, loader)
    _, loss16 = t16.train_network(1, loader)

    for tree in (t16.params, t16.opt_state):
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

    assert np.isfinite(loss16)
    assert abs(loss16 - loss32) / abs(loss32) < 0.05, (loss16, loss32)
    assert loss16 != loss32  # identical would mean the cast was a no-op


def test_bf16_loss_decreases(tmp_path):
    loader = _loader(n_batches=3, seed=7)
    t16 = _make("bf16", tmp_path)
    losses = [t16.train_network(e, loader)[1] for e in range(1, 5)]
    assert losses[-1] < losses[0], losses


def test_bf16_fully_masked_row_stays_finite(tmp_path):
    """The masked-rows invariant (test_padded_rows) must survive bf16:
    a fully padded dialogue row keeps the loss and the updated params
    finite."""
    loader = _loader(n_batches=1, poison_row=2)
    t16 = _make("bf16", tmp_path)
    _, loss = t16.train_network(1, loader)
    assert np.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(t16.params):
        assert bool(jnp.isfinite(leaf).all()), "non-finite param after step"


def test_bf16_dialogue_rnn_step(tmp_path):
    """DialogueRNN is the model the bf16 lever is for (PERF.md bound
    diagnosis) — one step must run and stay finite."""
    loader = _loader(n_batches=1, L=8, B=3)
    t16 = _make("bf16", tmp_path, model="DialogueRNN")
    _, loss = t16.train_network(1, loader)
    assert np.isfinite(loss)


def test_compute_dtype_validation(tmp_path):
    with pytest.raises(ValueError):
        _make("fp16", tmp_path)
