"""AOT serving artifacts (ser_tpu/serving.py + serve.py CLI).

The export bakes trained params into a serialized multi-platform
``jax.export`` StableHLO artifact; ``ServingModel`` pads smaller batches
to the exported [L, B] and unpads results. Contract pinned here: serving
a batch == running the checkpoint on the same batch padded to [L, B]
(the reference's own padded-eval semantics)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec
from ser_tpu.serving import ServingModel, save_model

L, B = 12, 4


def _trained_params(model_name="MARN1_onlysp"):
    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=0).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    return spec, model, params


def test_roundtrip_exact_at_export_shape(tmp_path):
    spec, model, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, B, platforms=("cpu",))

    served = ServingModel.load(path)
    batch = {k: v for k, v in
             synthetic_batch(L=L, B=B, seed=3).items() if k != "vid"}
    out = served.predict(batch)

    args = spec.make_inputs({k: jnp.asarray(v) for k, v in batch.items()})
    ref = np.asarray(spec.extract_logp(
        model.apply({"params": params}, *args, deterministic=True)))
    ref = ref.reshape(B, L, -1)
    np.testing.assert_allclose(out["logp"], ref, atol=2e-4)


def test_padding_contract_smaller_batch(tmp_path):
    """A [l < L, b < B] batch == the checkpoint run on the same batch
    PADDED to [L, B] (rows sliced back)."""
    spec, model, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, B, platforms=("cpu",))
    served = ServingModel.load(path)

    small = {k: v for k, v in
             synthetic_batch(L=8, B=2, seed=5).items() if k != "vid"}
    out = served.predict(small)
    assert out["logp"].shape == (2, 8, 6)
    assert out["preds"].shape == (2, 8)

    padded = {}
    for k, v in small.items():
        v = np.asarray(v)
        if k in ("umask", "label"):
            pad = [(0, B - 2), (0, L - 8)]
        else:
            pad = [(0, L - 8), (0, B - 2)] + [(0, 0)] * (v.ndim - 2)
        padded[k] = np.pad(v, pad)
    args = spec.make_inputs({k: jnp.asarray(v) for k, v in padded.items()})
    ref = np.asarray(spec.extract_logp(
        model.apply({"params": params}, *args, deterministic=True)))
    ref = ref.reshape(B, L, -1)[:2, :8]
    np.testing.assert_allclose(out["logp"], ref, atol=2e-4)


def test_oversize_batch_rejected(tmp_path):
    _, _, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, B, platforms=("cpu",))
    served = ServingModel.load(path)
    big = {k: v for k, v in
           synthetic_batch(L=L + 4, B=B, seed=1).items() if k != "vid"}
    with pytest.raises(ValueError, match="exceeds the exported shape"):
        served.predict(big)


def test_serve_cli_export_then_run(tmp_path, capsys):
    """The full CLI path: checkpoint file -> export -> run on synthetic
    test split; metrics JSON comes out finite."""
    import serve
    from ser_tpu.train.trainer import ModelTrainer

    t = ModelTrainer(model="BiLSTM", seed=7, res_csv_path=None)
    ckpt = str(tmp_path / "bilstm.model")
    t.save_parameters(ckpt)

    art = str(tmp_path / "bilstm.ser")
    serve.main(["export", "--initial_model", ckpt, "--model", "BiLSTM",
                "--out", art, "--L", "16", "--B", "8",
                "--platforms", "cpu"])
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "artifact"] == art

    from ser_tpu.data.synthetic import generate_iemocap_pickles

    feats = generate_iemocap_pickles(str(tmp_path / "data"), n_train=10,
                                     n_test=6, min_len=4, max_len=12,
                                     seed=1)
    serve.main(["run", "--artifact", art, "--feature_path", feats])
    out = capsys.readouterr().out
    report = json.loads(out[out.find("{"):])
    assert np.isfinite(report["weighted_accuracy"])
    assert report["n_utterances"] > 0


def test_bucketed_export_selects_smallest_admitting(tmp_path):
    """A multi-bucket artifact routes each query to the smallest bucket
    that admits it, and every bucket agrees with the direct checkpoint
    forward (padding contract per bucket)."""
    spec, model, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, [2, B], platforms=("cpu",))
    served = ServingModel.load(path)
    assert served.buckets == [(L, 2), (L, B)]

    def ref_logp(batch, Lp, Bp):
        padded = {}
        for k, v in batch.items():
            v = np.asarray(v)
            b, l = np.asarray(batch["umask"]).shape
            if k in ("umask", "label"):
                pad = [(0, Bp - b), (0, Lp - l)]
            else:
                pad = [(0, Lp - l), (0, Bp - b)] + [(0, 0)] * (v.ndim - 2)
            padded[k] = np.pad(v, pad)
        args = spec.make_inputs(
            {k: jnp.asarray(v) for k, v in padded.items()})
        out = np.asarray(spec.extract_logp(
            model.apply({"params": params}, *args, deterministic=True)))
        return out.reshape(Bp, Lp, -1)

    small = {k: v for k, v in
             synthetic_batch(L=8, B=1, seed=4).items() if k != "vid"}
    out = served.predict(small)
    assert served.last_bucket == (L, 2)  # NOT the full [L, B] export
    np.testing.assert_allclose(out["logp"], ref_logp(small, L, 2)[:1, :8],
                               atol=2e-4)

    big = {k: v for k, v in
           synthetic_batch(L=L, B=3, seed=6).items() if k != "vid"}
    out = served.predict(big)
    assert served.last_bucket == (L, B)  # b=3 overflows the B=2 bucket
    np.testing.assert_allclose(out["logp"], ref_logp(big, L, B)[:3],
                               atol=2e-4)


def test_bucketed_oversize_rejected_and_header_max(tmp_path):
    _, _, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, [2, B], platforms=("cpu",))
    served = ServingModel.load(path)
    # legacy header fields advertise the largest admittable shape
    assert (served.header["L"], served.header["B"]) == (L, B)
    big = {k: v for k, v in
           synthetic_batch(L=L, B=B + 1, seed=1).items() if k != "vid"}
    with pytest.raises(ValueError, match="exceeds the exported shape"):
        served.predict(big)


def test_serve_cli_bench_smoke(tmp_path, capsys):
    """`serve.py bench` reports finite per-bucket latency for every bucket
    in the artifact (the serving latency story's measurement tool)."""
    import serve
    from ser_tpu.train.trainer import ModelTrainer

    t = ModelTrainer(model="BiLSTM", seed=3, res_csv_path=None)
    ckpt = str(tmp_path / "bilstm.model")
    t.save_parameters(ckpt)
    art = str(tmp_path / "bilstm.ser")
    serve.main(["export", "--initial_model", ckpt, "--model", "BiLSTM",
                "--out", art, "--L", "12", "--B", "2,4",
                "--platforms", "cpu"])
    capsys.readouterr()

    serve.main(["bench", "--artifact", art, "--iters", "3"])
    out = capsys.readouterr().out
    report = json.loads(out[out.find("{"):])
    assert set(report["buckets"]) == {"L12_B2", "L12_B4"}
    for row in report["buckets"].values():
        assert row["ms_per_call"] > 0
        assert np.isfinite(row["utterances_per_sec"])


def test_predict_needs_no_model_code(tmp_path):
    """The artifact is self-contained: predict() assembles inputs from the
    header's recorded convention and never touches the model registry
    (serving a .ser file must not require the Flax zoo)."""
    spec, model, params = _trained_params()
    path = str(tmp_path / "m.ser")
    save_model(path, "MARN1_onlysp", params, L, B, platforms=("cpu",))

    served = ServingModel.load(path)
    assert served.header["inputs"] == "marn1"
    batch = {k: v for k, v in
             synthetic_batch(L=L, B=B, seed=9).items() if k != "vid"}
    out = served.predict(batch)
    assert out["preds"].shape == (B, L)
    # the registry fallback (legacy artifacts only) was never consulted
    assert served._spec is None


def test_bf16_export_deployment_precision(tmp_path):
    """dtype='bf16' bakes bf16 params and computes in bfloat16 with an f32
    in/out signature: predictions track the f32 artifact (argmax stable on
    confident rows; log-probs within bf16 drift) and the header records
    the precision."""
    spec, model, params = _trained_params()
    p32 = str(tmp_path / "m32.ser")
    p16 = str(tmp_path / "m16.ser")
    save_model(p32, "MARN1_onlysp", params, L, B, platforms=("cpu",))
    save_model(p16, "MARN1_onlysp", params, L, B, platforms=("cpu",),
               dtype="bf16")

    s32, s16 = ServingModel.load(p32), ServingModel.load(p16)
    assert s16.header["dtype"] == "bf16"
    batch = {k: v for k, v in
             synthetic_batch(L=L, B=B, seed=5).items() if k != "vid"}
    o32, o16 = s32.predict(batch), s16.predict(batch)
    assert o16["logp"].dtype == np.float32  # signature stays f32
    assert np.all(np.isfinite(o16["logp"]))
    # bf16 has ~3 significant decimal digits. A random-init model's
    # log-probs are near-uniform (~log 1/6 everywhere), the worst case
    # for relative agreement: drift accumulated through the recurrence
    # shows up directly, and argmax between near-ties is a coin flip —
    # so pin the magnitude of the drift, not prediction identity (the
    # trained-checkpoint accuracy story is measured on TPU, PERF.md).
    err = float(np.max(np.abs(o16["logp"] - o32["logp"])))
    assert err < 0.5, err
    mean_err = float(np.mean(np.abs(o16["logp"] - o32["logp"])))
    assert mean_err < 0.1, mean_err


def test_bf16_export_rejects_bad_dtype(tmp_path):
    spec, model, params = _trained_params()
    with pytest.raises(ValueError, match="dtype"):
        save_model(str(tmp_path / "x.ser"), "MARN1_onlysp", params, L, B,
                   platforms=("cpu",), dtype="fp8")
