"""Fusion-weight introspection + orbax checkpoint backend."""

import jax
import numpy as np

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
