"""Epoch loaders with the reference's sampler semantics.

``get_loaders`` mirrors ``/root/reference/dataloader.py:146-182``: the valid
split is the FIRST ``valid`` fraction of the *unshuffled index order* of the
train set; train/valid are shuffled subsets (SubsetRandomSampler semantics),
test iterates in order. Loaders yield padded batch dicts (see collate.py).

Host-side only — no torch DataLoader. Feature tensors are tiny (the whole of
IEMOCAP fits in memory many times over), so the pipeline is synchronous
numpy; the device never waits on input for realistic shapes.
"""

from __future__ import annotations

import numpy as np

from ser_tpu.data.collate import DEFAULT_BUCKETS, collate
from ser_tpu.data.datasets import IEMOCAPDataset, MELDDataset


class EpochLoader:
    """Iterates a dataset subset in batches, reshuffling each epoch."""

    def __init__(
        self,
        dataset,
        indices,
        batch_size,
        shuffle=True,
        seed=0,
        pad_batch_to_full=True,
        buckets=DEFAULT_BUCKETS,
        max_length=None,
        process_index=0,
        process_count=1,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.pad_batch_to_full = pad_batch_to_full
        self.buckets = buckets
        self.max_length = max_length
        # Multi-host DP (SURVEY §5.8): every process builds the SAME global
        # batch (same seed -> same shuffle -> same composition and length
        # bucket as single-process math), then yields only its contiguous
        # B/process_count rows; parallel.mesh.shard_batch reassembles the
        # global array via jax.make_array_from_process_local_data. Dataset
        # features live in host memory on every process (pickle-backed), so
        # slicing after collate costs nothing and avoids any cross-process
        # length/bucket coordination.
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"{process_count} processes")
        if process_count > 1 and not pad_batch_to_full:
            raise ValueError(
                "multi-process loading requires pad_batch_to_full=True "
                "(every process must emit equal-shaped local rows)")
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        return int(np.ceil(len(self.indices) / self.batch_size))

    def num_examples(self):
        return len(self.indices)

    def advance_epochs(self, n):
        """Consume ``n`` epochs' worth of shuffle randomness without loading
        data. --resume uses this so a run restarted at epoch N sees the same
        batch order the uninterrupted run would have seen (each ``__iter__``
        burns exactly one ``rng.shuffle`` of the index array)."""
        for _ in range(int(n)):
            if self.shuffle:
                self.rng.shuffle(self.indices.copy())

    def __iter__(self):
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            items = [self.dataset[int(i)] for i in chunk]
            pad_batch = self.batch_size if self.pad_batch_to_full else None
            batch = collate(
                items,
                pad_length=self.max_length,
                pad_batch=pad_batch,
                buckets=self.buckets,
            )
            if self.process_count > 1:
                batch = self._local_rows(batch)
            yield batch

    def _local_rows(self, batch):
        """Slice this process's contiguous rows out of a global batch.

        The global umask/label are kept under ``*_global`` keys: device
        arrays are assembled from the local rows, but host-side metric and
        loss-weight bookkeeping needs the global view (eval predictions
        come back fully replicated)."""
        k = self.batch_size // self.process_count
        lo = self.process_index * k
        out = {"umask_global": batch["umask"], "label_global": batch["label"]}
        for name, v in batch.items():
            if name == "vid":
                out[name] = v[lo:lo + k]
            elif name in ("umask", "label", "wav_len"):  # batch-major
                out[name] = v[lo:lo + k]
            else:  # time-major [L, B, ...]
                out[name] = v[:, lo:lo + k]
        return out


class PrefetchLoader:
    """Overlaps host batch assembly with device compute: a background thread
    keeps up to ``depth`` collated batches ready (the reference gets the same
    effect from torch DataLoader(num_workers=2), ``dataloader.py:164-180``)."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def num_examples(self):
        return self.loader.num_examples()

    def advance_epochs(self, n):
        self.loader.advance_epochs(n)

    def __iter__(self):
        import queue
        import threading

        q = queue.Queue(maxsize=self.depth)
        stop = object()
        abandoned = threading.Event()

        def worker():
            # Exceptions are forwarded to the consumer (a swallowed
            # mid-epoch failure would silently truncate the epoch); the
            # abandoned flag keeps an early-exiting consumer from leaving
            # this thread blocked in q.put forever.
            try:
                for batch in self.loader:
                    while not abandoned.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
                # the stop sentinel needs the same abandoned-aware put: a
                # consumer that breaks AFTER the loader is exhausted (queue
                # still holding depth batches) would otherwise leave this
                # thread blocked in a bare q.put forever
                while not abandoned.is_set():
                    try:
                        q.put(stop, timeout=0.1)
                        break
                    except queue.Full:
                        continue
            except BaseException as e:  # noqa: BLE001 - forwarded, not hidden
                while not abandoned.is_set():
                    try:
                        q.put((stop, e), timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is stop:
                    raise item[1]
                yield item
            t.join()
        finally:
            abandoned.set()


def get_train_valid_indices(n, valid=0.1):
    """First ``valid`` fraction of index order -> valid, rest -> train
    (ref ``dataloader.py:146-150``)."""
    idx = np.arange(n)
    split = int(valid * n)
    return idx[split:], idx[:split]


def get_loaders(
    feature_path,
    dataset="IEMOCAP",
    batch_size=32,
    valid=0.1,
    num_workers=0,
    n_classes=3,
    seed=0,
    roberta_path=None,
    wav_path=None,
    **kwargs,
):
    """Build (train, valid, test) loaders (ref ``dataloader.py:153-182``).

    ``wav_path``: optional raw-audio pickle ({vid: [n_utt, T]}) enabling the
    on-device MFCC front-end path; "auto" picks IEMOCAP_wav.pkl next to the
    main pickle."""
    del num_workers  # host pipeline is synchronous numpy
    if dataset == "IEMOCAP":
        path = feature_path + "IEMOCAP_features/IEMOCAP_features_raw.pkl"
        if wav_path == "auto":
            import os

            wav_path = os.path.join(os.path.dirname(path), "IEMOCAP_wav.pkl")
        trainset = IEMOCAPDataset(path=path, roberta_path=roberta_path,
                                  wav_path=wav_path)
        testset = IEMOCAPDataset(path=path, train=False,
                                 roberta_path=roberta_path, wav_path=wav_path)
    elif dataset == "MELD":
        path = feature_path + "MELD_features/MELD_features_raw.pkl"
        trainset = MELDDataset(path=path, n_classes=n_classes, roberta_path=roberta_path)
        testset = MELDDataset(
            path=path, n_classes=n_classes, train=False, roberta_path=roberta_path
        )
    else:
        raise ValueError(f"unknown dataset: {dataset}")

    train_idx, valid_idx = get_train_valid_indices(len(trainset), valid)
    train_loader = EpochLoader(
        trainset, train_idx, batch_size, shuffle=True, seed=seed, **kwargs
    )
    valid_loader = EpochLoader(
        trainset, valid_idx, batch_size, shuffle=True, seed=seed + 1, **kwargs
    )
    test_loader = EpochLoader(
        testset,
        np.arange(len(testset)),
        batch_size,
        shuffle=False,
        seed=seed + 2,
        **kwargs,
    )
    return train_loader, valid_loader, test_loader
