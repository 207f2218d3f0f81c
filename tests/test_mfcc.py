"""MFCC front-end: XLA formulation vs numpy oracle; Pallas vs XLA."""

import numpy as np
import jax.numpy as jnp
import pytest

from ser_tpu.ops.pallas.mfcc import (
    MFCCConfig,
    dct_matrix,
    hamming_window,
    mel_filterbank,
    mfcc_pallas,
    mfcc_xla,
)


def mfcc_oracle(x, cfg):
    """Independent numpy implementation using np.fft."""
    B, T = x.shape
    F = cfg.n_frames(T)
    win = hamming_window(cfg.win_length)
    mel_fb = mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels)
    dct = dct_matrix(cfg.n_mels, cfg.n_mfcc)

    out = np.zeros((B, F, cfg.n_mfcc), dtype=np.float64)
    for b in range(B):
        sig = x[b]
        y = np.empty_like(sig)
        y[0] = sig[0] - cfg.preemph * sig[1]  # reflect pad
        y[1:] = sig[1:] - cfg.preemph * sig[:-1]
        for f in range(F):
            frame = y[f * cfg.hop : f * cfg.hop + cfg.win_length] * win
            spec = np.fft.rfft(frame, n=cfg.n_fft)
            power = np.abs(spec) ** 2
            logmel = np.log(power @ mel_fb + cfg.eps)
            out[b, f] = logmel @ dct
    return out


@pytest.fixture(scope="module")
def cfg():
    return MFCCConfig(sr=16000, n_fft=512, win_length=400, hop=160,
                      n_mels=40, n_mfcc=13)


def test_xla_matches_numpy_oracle(cfg):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16000)).astype(np.float32)  # 1 s of audio
    got = np.asarray(mfcc_xla(jnp.asarray(x), cfg))
    expected = mfcc_oracle(x, cfg)
    assert got.shape == (2, cfg.n_frames(16000), 13)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_pallas_matches_xla_interpret(cfg):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    ours = np.asarray(mfcc_pallas(jnp.asarray(x), cfg, interpret=True))
    ref = np.asarray(mfcc_xla(jnp.asarray(x), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_frame_count(cfg):
    assert cfg.n_frames(16000) == 1 + (16000 - 400) // 160
    assert cfg.n_frames(400) == 1
    assert cfg.n_frames(399) == 0
