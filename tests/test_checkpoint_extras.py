"""Fusion-weight introspection + orbax checkpoint backend."""

import jax
import numpy as np
import pytest

from ser_tpu.train import checkpoint as ckpt
from ser_tpu.train.trainer import ModelTrainer


def test_fusion_weights_onlysp():
    tr = ModelTrainer(model="MARN1_onlysp", res_csv_path=None)
    w = tr.fusion_weights()
    assert set(w) == {"w", "v", "v1", "v2"}
    assert all(v == 1.0 for v in w.values())  # ones-init


def test_fusion_weights_nsps_softmax_p():
    tr = ModelTrainer(model="MARN1_nsps", res_csv_path=None)
    w = tr.fusion_weights()
    assert "p" in w
    np.testing.assert_allclose(sum(w["p"]), 1.0, rtol=1e-6)


def test_orbax_roundtrip(tmp_path):
    tr = ModelTrainer(model="BiLSTM", res_csv_path=None)
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_parameters_orbax(tr.params, path)
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, tr.params)
    restored = ckpt.load_parameters_orbax(zeroed, path)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exact_resume_roundtrip(tmp_path):
    """--save_state/--resume: a run interrupted after epoch 1 and resumed
    must produce bit-identical params to the uninterrupted run (params +
    Adam moments + LR position + dropout key stream all restored)."""
    from ser_tpu.data.synthetic import synthetic_batch

    batches = [synthetic_batch(L=6, B=4, seed=s) for s in (0, 1)]

    def make():
        return ModelTrainer(model="MARN1_onlysp", seed=123,
                            res_csv_path=None)

    # uninterrupted: epochs 1 and 2
    a = make()
    a.train_network(1, batches)
    a.train_network(2, batches)

    # interrupted: epoch 1, save, fresh process, resume, epoch 2
    b = make()
    b.train_network(1, batches)
    path = str(tmp_path / "last.state")
    b.save_train_state(path, epoch=1)

    c = make()
    ep = c.load_train_state(path)
    assert ep == 1
    c.train_network(ep + 1, batches)

    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(c.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state restored too (Adam count advanced identically)
    for x, y in zip(jax.tree_util.tree_leaves(a.opt_state),
                    jax.tree_util.tree_leaves(c.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _tiny_items(n=8, seed=0):
    """In-memory 10-field dataset items at IEMOCAP feature dims, tiny T."""
    from ser_tpu.data.synthetic import synthetic_items

    return synthetic_items(n=n, seed=seed, min_len=3, max_len=7)


def test_exact_resume_with_shuffling_loader(tmp_path):
    """The resumed run must also replay the LOADER's shuffle order: the
    .state file restores params/Adam/dropout-RNG, and advance_epochs()
    fast-forwards the loader's numpy Generator past the finished epochs
    (without it, epoch 2 after resume would re-use the epoch-1 batch order
    and diverge from the uninterrupted run)."""
    from ser_tpu.data.loaders import EpochLoader

    items = _tiny_items()

    def make_loader():
        return EpochLoader(items, np.arange(len(items)), batch_size=4,
                           shuffle=True, seed=7)

    def make():
        return ModelTrainer(model="MARN1_onlysp", seed=123,
                            res_csv_path=None)

    a = make()
    la = make_loader()
    a.train_network(1, la)
    a.train_network(2, la)

    b = make()
    lb = make_loader()
    b.train_network(1, lb)
    path = str(tmp_path / "last.state")
    b.save_train_state(path, epoch=1)

    c = make()
    lc = make_loader()  # fresh Generator, as after a process restart
    ep = c.load_train_state(path)
    lc.advance_epochs(ep)  # what train.py --resume does
    c.train_network(ep + 1, lc)

    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(c.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_latest_resolution(tmp_path, capsys):
    """--resume latest: fresh start when save_path has no last.state yet,
    exact-resume path once --save_state has written one (the
    preemption-safe restart loop's contract)."""
    from train import _resolve_resume

    save = str(tmp_path / "model")
    assert _resolve_resume("", save) == ""
    assert _resolve_resume("some/explicit.state", save) == \
        "some/explicit.state"
    assert _resolve_resume("latest", save) == ""  # nothing saved yet
    assert "starting fresh" in capsys.readouterr().out

    import os

    os.makedirs(save, exist_ok=True)
    open(save + "/last.state", "wb").close()
    assert _resolve_resume("latest", save) == save + "/last.state"


def test_saves_are_atomic(tmp_path, monkeypatch):
    """An interrupted save must never truncate the existing file —
    --resume latest's restart loop depends on last.state always being a
    complete state (old or new)."""
    import os

    import ser_tpu.train.checkpoint as ck

    path = str(tmp_path / "last.state")
    with open(path, "wb") as f:
        f.write(b"OLD-GOOD-STATE")

    real_replace = os.replace

    def crashing_replace(src, dst):
        raise RuntimeError("preempted between write and publish")

    monkeypatch.setattr(ck.os, "replace", crashing_replace)
    with pytest.raises(RuntimeError):
        ck._atomic_write(path, b"NEW-PARTIAL")
    assert open(path, "rb").read() == b"OLD-GOOD-STATE"  # old file intact

    monkeypatch.setattr(ck.os, "replace", real_replace)
    ck._atomic_write(path, b"NEW-COMPLETE")
    assert open(path, "rb").read() == b"NEW-COMPLETE"
    assert not os.path.exists(path + ".tmp")
