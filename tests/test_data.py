"""Data layer: synthetic pickles -> datasets -> collate -> loaders."""

import numpy as np
import pytest

from ser_tpu.data.collate import bucket_length, collate
from ser_tpu.data.datasets import IEMOCAPDataset
from ser_tpu.data.loaders import get_loaders, get_train_valid_indices
from ser_tpu.data.synthetic import generate_iemocap_pickles, synthetic_batch


@pytest.fixture(scope="module")
def feature_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    return generate_iemocap_pickles(
        str(out), n_train=12, n_test=4, min_len=5, max_len=20, seed=0
    )


def test_dataset_schema(feature_path):
    ds = IEMOCAPDataset(
        feature_path + "IEMOCAP_features/IEMOCAP_features_raw.pkl"
    )
    assert len(ds) == 12
    item = ds[0]
    r1, r2, r3, r4, vis, aud, qmask, umask, label, vid = item
    T = label.shape[0]
    assert r1.shape == (T, 1024) and vis.shape == (T, 512)
    assert aud.shape == (T, 100) and qmask.shape == (T, 2)
    assert umask.shape == (T,) and np.all(umask == 1)
    assert set(np.unique(qmask.sum(1))) == {1.0}


def test_collate_shapes(feature_path):
    ds = IEMOCAPDataset(
        feature_path + "IEMOCAP_features/IEMOCAP_features_raw.pkl"
    )
    items = [ds[i] for i in range(4)]
    batch = collate(items)
    L, B = batch["r1"].shape[:2]
    assert B == 4
    assert L == bucket_length(max(it[8].shape[0] for it in items))
    assert batch["umask"].shape == (B, L)
    assert batch["label"].shape == (B, L)
    assert batch["qmask"].shape == (L, B, 2)
    # padding is zero and masked
    lengths = batch["umask"].sum(1).astype(int)
    for b in range(B):
        assert np.all(batch["r1"][lengths[b]:, b] == 0)


def test_collate_pad_batch(feature_path):
    ds = IEMOCAPDataset(
        feature_path + "IEMOCAP_features/IEMOCAP_features_raw.pkl"
    )
    batch = collate([ds[0]], pad_batch=3)
    assert batch["r1"].shape[1] == 3
    assert np.all(batch["umask"][1:] == 0)


def test_train_valid_split_semantics():
    # first `valid` fraction of unshuffled order -> valid (dataloader.py:146-150)
    tr, va = get_train_valid_indices(10, valid=0.2)
    assert list(va) == [0, 1]
    assert list(tr) == list(range(2, 10))


def test_get_loaders(feature_path):
    train, valid, test = get_loaders(
        feature_path, dataset="IEMOCAP", batch_size=4, valid=0.25, n_classes=6
    )
    assert train.num_examples() == 9 and valid.num_examples() == 3
    assert test.num_examples() == 4
    batches = list(train)
    assert sum(int(b["umask"].any(axis=1).sum()) for b in batches) == 9
    b0 = batches[0]
    assert b0["r1"].shape[1] == 4  # padded to full batch


def test_synthetic_batch_shapes():
    b = synthetic_batch(L=16, B=3, seed=1)
    assert b["r1"].shape == (16, 3, 1024)
    assert b["qmask"].shape == (16, 3, 2)
    assert b["umask"].shape == (3, 16)
    # qmask one-hot on valid steps, zero on padded
    valid = b["umask"].T.astype(bool)
    assert np.all(b["qmask"].sum(-1)[valid] == 1)
    assert np.all(b["qmask"].sum(-1)[~valid] == 0)


def test_prefetch_loader_forwards_worker_exceptions():
    """A mid-epoch loader failure must surface in the consumer, not
    silently truncate the epoch (historic bug: the worker swallowed it)."""
    import pytest

    from ser_tpu.data.loaders import PrefetchLoader

    class Boom:
        def __iter__(self):
            yield {"ok": 1}
            raise RuntimeError("corrupt batch")

        def __len__(self):
            return 2

        def num_examples(self):
            return 2

    got = []
    with pytest.raises(RuntimeError, match="corrupt batch"):
        for b in PrefetchLoader(Boom()):
            got.append(b)
    assert got == [{"ok": 1}]


def test_prefetch_loader_abandoned_consumer_does_not_block_worker():
    """Breaking out of iteration early must release the worker thread."""
    import threading

    from ser_tpu.data.loaders import PrefetchLoader

    n_before = threading.active_count()
    for _ in range(5):
        for i, b in enumerate(PrefetchLoader(
                iter_loader := _ListLoader([{"i": k} for k in range(50)]),
                depth=1)):
            if i == 1:
                break
    import time

    time.sleep(0.5)  # workers should exit via the abandoned flag
    assert threading.active_count() <= n_before + 1


class _ListLoader:
    def __init__(self, items):
        self.items = items

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)

    def num_examples(self):
        return len(self.items)


def test_eval_network_empty_loader_returns_zero_metrics():
    from ser_tpu.train.trainer import ModelTrainer

    t = ModelTrainer(model="MARN1_onlysp", seed=1, res_csv_path=None)
    acc, f1, extra = t.eval_network(_ListLoader([]), dump_csv=False)
    assert (acc, f1, extra) == (0.0, 0.0, {})
