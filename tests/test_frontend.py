"""On-device MFCC audio front-end wired into the data pipeline (VERDICT r1
item 3): raw waveforms flow dataset -> collate -> trainer -> fused MFCC
kernel -> the 100-d audio slot, inside the jitted step."""

import numpy as np

from ser_tpu.data.frontend import MFCCFrontend, make_frontend
from ser_tpu.ops.pallas.mfcc import mfcc_xla


def test_frontend_pooling_matches_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    L, B, T = 3, 2, 2400
    wav = rng.standard_normal((L, B, T)).astype(np.float32)
    fe = MFCCFrontend(out_dim=100, use_pallas=False)
    out = np.asarray(fe(jnp.asarray(wav)))
    assert out.shape == (L, B, 100)

    feats = np.asarray(mfcc_xla(jnp.asarray(wav.reshape(L * B, T)), fe.cfg))
    mean = feats.mean(1)
    std = feats.std(1)
    expected = np.concatenate([mean, std], -1).reshape(L, B, 100)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_variable_length_wavs_collate_and_pool_masked():
    """Dialogues with different sample lengths: collate pads the sample
    axis to a 2048 bucket and emits wav_len; frame-masked pooling must
    reproduce the unpadded features for the shorter dialogue exactly."""
    import jax.numpy as jnp

    from ser_tpu.data.collate import collate

    rng = np.random.default_rng(1)
    n_utt, d = 2, 4
    T_short, T_long = 2400, 4000

    def item(T):
        # 10-field dataset tuple layout (r1..r4, visuf, acouf, qmask,
        # umask, label, vid) + optional field 10 raw wav [n_utt, T]
        fields = [rng.standard_normal((n_utt, 100)).astype(np.float32)
                  for _ in range(6)]
        fields.append(rng.standard_normal((n_utt, 2)).astype(np.float32))
        return tuple(fields) + (
            np.ones(n_utt, np.float32),
            np.zeros(n_utt, np.int64),
            "vid",
            rng.standard_normal((n_utt, T)).astype(np.float32),
        )

    short, long_ = item(T_short), item(T_long)
    batch = collate([short, long_], pad_length=n_utt, pad_batch=2)
    assert batch["wav"].shape[-1] == 4096  # 4000 -> next 2048 bucket
    np.testing.assert_array_equal(batch["wav_len"], [T_short, T_long])

    fe = MFCCFrontend(out_dim=100, use_pallas=False)
    pooled = np.asarray(fe(jnp.asarray(batch["wav"]),
                           jnp.asarray(batch["wav_len"])))
    # the short dialogue, unpadded, through the plain (unmasked) path
    alone = np.asarray(fe(jnp.asarray(short[10])))
    np.testing.assert_allclose(pooled[:, 0], alone, rtol=2e-4, atol=1e-5)


def test_frontend_padding_rows_finite():
    import jax.numpy as jnp

    wav = jnp.zeros((2, 3, 1200), jnp.float32)  # all-padding rows
    out = np.asarray(MFCCFrontend(use_pallas=False)(wav))
    assert np.isfinite(out).all()


def test_make_frontend_registry():
    assert make_frontend(None) is None
    assert make_frontend("none") is None
    assert isinstance(make_frontend("mfcc"), MFCCFrontend)
    import pytest

    with pytest.raises(KeyError):
        make_frontend("nope")


def test_train_e2e_with_mfcc_frontend(tmp_path):
    """Raw-audio path end to end: synthetic wav pickles -> loaders ->
    trainer with the on-device front-end -> finite falling loss, and the
    audio slot genuinely comes from the waveforms (class-separable signal
    -> eval above chance with text/visual noise-only would be impossible;
    here we just require finite loss and a successful eval pass)."""
    from ser_tpu.data.loaders import get_loaders
    from ser_tpu.data.synthetic import generate_iemocap_pickles
    from ser_tpu.train.trainer import ModelTrainer

    fp = generate_iemocap_pickles(
        str(tmp_path), n_train=8, n_test=4, min_len=4, max_len=8, seed=3,
        with_wav=True, wav_len=1600)
    train_loader, _, test_loader = get_loaders(
        fp, dataset="IEMOCAP", batch_size=4, valid=0.25, n_classes=6,
        wav_path="auto")

    batch = next(iter(train_loader))
    assert "wav" in batch and batch["wav"].ndim == 3

    trainer = ModelTrainer(model="MARN1_onlysp", n_classes=6,
                           res_csv_path=None, audio_frontend="mfcc")
    losses = []
    for epoch in (1, 2):
        _, loss = trainer.train_network(epoch, train_loader)
        losses.append(loss)
    assert np.isfinite(losses).all()
    acc, f1, _ = trainer.eval_network(test_loader, dump_csv=False)
    assert 0.0 <= acc <= 100.0 and np.isfinite(f1)
