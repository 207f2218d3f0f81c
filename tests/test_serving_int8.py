"""Weights-only int8 serving artifacts (serve.py export --dtype int8).

Pins: (a) the int8 artifact round-trips (quantize -> serialize -> load ->
dequantized bf16 compute) and its logp stays close to the f32 artifact
with high argmax agreement; (b) the artifact is materially smaller than
the f32 export; (c) the quantizer's reconstruction error is bounded by
one quantization step per channel.
"""

import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.serving import (
    ServingModel, _dequantize_int8, _quantize_int8, save_model)

L, B = 12, 4


@pytest.fixture(scope="module")
def params():
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("MARN1_newz")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=0).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    return model.init({"params": key, "dropout": key}, *args,
                      deterministic=True)["params"]


def test_quantize_reconstruction_bound(params):
    import jax
    import jax.numpy as jnp

    q = _quantize_int8(jax.tree_util.tree_map(np.asarray, params))
    deq = _dequantize_int8(jax.tree_util.tree_map(jnp.asarray, q),
                           jnp.float32)
    flatp = jax.tree_util.tree_leaves(params)
    flatd = jax.tree_util.tree_leaves(deq)
    assert len(flatp) == len(flatd)
    for orig, rec in zip(flatp, flatd):
        orig, rec = np.asarray(orig), np.asarray(rec)
        if orig.ndim < 2 or orig.dtype != np.float32:
            np.testing.assert_array_equal(orig, rec)
            continue
        step = np.max(np.abs(orig), axis=tuple(range(orig.ndim - 1)),
                      keepdims=True) / 127.0
        assert np.all(np.abs(orig - rec) <= 0.51 * step + 1e-9)


def test_int8_artifact_close_to_f32(params, tmp_path):
    pf32 = str(tmp_path / "m_f32.ser")
    pint8 = str(tmp_path / "m_int8.ser")
    save_model(pf32, "MARN1_newz", params, L, B, platforms=("cpu",))
    save_model(pint8, "MARN1_newz", params, L, B, platforms=("cpu",),
               dtype="int8")

    import os

    size_f32 = os.path.getsize(pf32)
    size_int8 = os.path.getsize(pint8)
    assert size_int8 < 0.45 * size_f32, (size_int8, size_f32)

    batch = {k: v for k, v in
             synthetic_batch(L=L, B=B, seed=3).items() if k != "vid"}
    out32 = ServingModel.load(pf32).predict(batch)
    out8 = ServingModel.load(pint8).predict(batch)
    valid = np.asarray(batch["umask"]) > 0
    agree = (out8["preds"] == out32["preds"])[valid].mean()
    drift = np.abs(out8["logp"] - out32["logp"])[valid].max()
    # int8 weights + bf16 compute: logits drift at the precision scale but
    # decisions stay stable at random-init logit gaps.
    assert agree >= 0.9, f"argmax agreement {agree}"
    assert np.isfinite(drift) and drift < 1.0, drift
