"""MELD path: synthetic pickles -> dataset -> loaders -> train smoke."""

import numpy as np
import pytest

from ser_tpu.data.datasets import MELDDataset
from ser_tpu.data.loaders import get_loaders
from ser_tpu.data.synthetic import generate_meld_pickles
from ser_tpu.train.trainer import ModelTrainer


@pytest.fixture(scope="module")
def feature_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("meld")
    return generate_meld_pickles(str(out), n_train=12, n_test=4,
                                 min_len=4, max_len=10, seed=1)


def test_meld_dataset_schema(feature_path):
    ds = MELDDataset(feature_path + "MELD_features/MELD_features_raw.pkl",
                     n_classes=7)
    item = ds[0]
    r1, r2, r3, r4, textf, acouf, qmask, umask, label, vid = item
    T = label.shape[0]
    assert r1.shape == (T, 1024)
    assert textf.shape == (T, 600) and acouf.shape == (T, 300)
    assert qmask.shape == (T, 9)
    assert set(np.unique(qmask.sum(1))) == {1.0}
    assert label.max() < 7


def test_meld_3class_slot(feature_path):
    ds = MELDDataset(feature_path + "MELD_features/MELD_features_raw.pkl",
                     n_classes=3)
    item = ds[0]
    assert item[8].max() < 3  # sentiment labels in the 3-class slot


def test_meld_train_smoke(feature_path):
    train, valid, test = get_loaders(
        feature_path, dataset="MELD", batch_size=6, valid=0.25, n_classes=7)
    trainer = ModelTrainer(model="MARN1_onlysp", n_classes=7, dataset="MELD",
                           res_csv_path=None)
    losses = []
    for epoch in range(1, 7):
        _, loss = trainer.train_network(epoch, train)
        losses.append(loss)
    assert np.isfinite(losses).all()
    # smoke scale (12 tiny dialogues): early loss can transiently spike, so
    # require progress at SOME point rather than monotonic improvement
    assert min(losses[1:]) < losses[0]
    acc, f1, _ = trainer.eval_network(test, dump_csv=False)
    assert 0.0 <= acc <= 100.0 and 0.0 <= f1 <= 100.0


def test_comet_dataset(tmp_path):
    """IEMOCAPRobertaCometDataset reads the 2-pickle COMET schema."""
    import pickle

    from ser_tpu.data.datasets import IEMOCAPRobertaCometDataset

    rng = np.random.default_rng(0)
    vids = ["d0", "d1", "d2"]
    lens = {v: int(rng.integers(3, 6)) for v in vids}
    rob = lambda: {v: rng.standard_normal((lens[v], 1024)).astype(np.float32)
                   for v in vids}
    speakers = {v: ["M" if s else "F" for s in rng.integers(0, 2, lens[v])]
                for v in vids}
    labels = {v: rng.integers(0, 6, lens[v]).tolist() for v in vids}
    sentences = {v: ["s"] * lens[v] for v in vids}
    roberta_path = str(tmp_path / "roberta.pkl")
    with open(roberta_path, "wb") as f:
        pickle.dump((speakers, labels, rob(), rob(), rob(), rob(),
                     sentences, vids[:2], vids[2:], vids[2:]), f)
    comet_path = str(tmp_path / "comet.pkl")
    comet = tuple(
        {v: rng.standard_normal((lens[v], 768)).astype(np.float32)
         for v in vids}
        for _ in range(9))
    with open(comet_path, "wb") as f:
        pickle.dump(comet, f)

    ds = IEMOCAPRobertaCometDataset("train", roberta_path, comet_path)
    assert len(ds) == 2
    item = ds[0]
    assert len(item) == 17
    assert item[4].shape[-1] == 768  # xIntent
    assert item[13].shape[-1] == 2  # qmask
