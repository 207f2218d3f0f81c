"""Native C collate == numpy collate, and a micro-benchmark sanity check."""

import numpy as np
import pytest

import importlib

from ser_tpu import native

# the package __init__ shadows the submodule name with the function
collate_mod = importlib.import_module("ser_tpu.data.collate")

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="no C compiler available")


def _items(n=6, max_t=20, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        t = int(rng.integers(3, max_t + 1))
        items.append((
            rng.standard_normal((t, 1024)).astype(np.float32),
            rng.standard_normal((t, 1024)).astype(np.float32),
            rng.standard_normal((t, 1024)).astype(np.float32),
            rng.standard_normal((t, 1024)).astype(np.float32),
            rng.standard_normal((t, 512)).astype(np.float32),
            rng.standard_normal((t, 100)).astype(np.float32),
            np.eye(2, dtype=np.float32)[rng.integers(0, 2, t)],
            np.ones(t, dtype=np.float32),
            rng.integers(0, 6, t).astype(np.int32),
            f"v{i}",
        ))
    return items


def test_native_matches_numpy():
    items = _items()
    fast = collate_mod.collate(items)

    saved = collate_mod.native
    collate_mod.native = None
    try:
        slow = collate_mod.collate(items)
    finally:
        collate_mod.native = saved

    for k in ("r1", "r2", "r3", "r4", "visuf", "acouf", "qmask",
              "umask", "label"):
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)
    assert fast["vid"] == slow["vid"]


def test_pad_time_major_roundtrip():
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((t, 7)).astype(np.float32)
              for t in (3, 5, 2)]
    out = native.pad_time_major(arrays, L=6, B=4)
    assert out.shape == (6, 4, 7)
    for b, a in enumerate(arrays):
        np.testing.assert_array_equal(out[: a.shape[0], b], a)
        assert np.all(out[a.shape[0]:, b] == 0)
    assert np.all(out[:, 3] == 0)  # padded batch column


def test_pad_batch_first_dtypes():
    labels = [np.arange(t, dtype=np.int32) for t in (2, 4)]
    out = native.pad_batch_first(labels, L=5, B=3, dtype=np.int32)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out[1, :4], np.arange(4))
    assert np.all(out[2] == 0)
