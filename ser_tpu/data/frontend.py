"""On-device audio front-end: raw waveforms -> the 100-d audio feature slot.

The reference consumes precomputed 100-d audio features from pickles
(``/root/reference/dataloader.py:13-20``) and ships only a dead PreEmphasis
module (``utils.py:21-37``) as DSP. This module closes the gap the north star
asks for: a raw-audio path where the fused framing/FFT/mel/MFCC kernel
(``ser_tpu.ops.pallas.mfcc``) runs batch-wise on device inside the jitted
train/eval step, streaming batched utterance features into HBM.

Feature layout: ``out_dim//2`` MFCC coefficients, mean- and std-pooled over
frames -> ``out_dim`` floats per utterance (default 100, matching the
reference's audio slot so every model consumes it unchanged).
"""

from __future__ import annotations

import jax.numpy as jnp

from ser_tpu.ops.pallas.mfcc import MFCCConfig, mfcc


class MFCCFrontend:
    """Maps padded waveforms [L, B, T] -> audio features [L, B, out_dim]."""

    def __init__(self, out_dim: int = 100, sr: int = 16000, n_fft: int = 512,
                 win_length: int = 400, hop: int = 160, n_mels: int = 64,
                 use_pallas: bool | None = None):
        if out_dim % 2:
            raise ValueError("out_dim must be even (mean+std pooling)")
        self.out_dim = out_dim
        self.cfg = MFCCConfig(sr=sr, n_fft=n_fft, win_length=win_length,
                              hop=hop, n_mels=n_mels, n_mfcc=out_dim // 2)
        self.use_pallas = use_pallas

    def __call__(self, wav, wav_len=None):
        """wav: [L, B, T] (or [N, T]) padded waveforms; all-zero rows (batch
        padding) produce a constant, finite feature vector (std 0, mean
        log-eps energy), which umask already neutralizes downstream.

        wav_len: optional [B] per-dialogue sample counts (collate emits
        them when dialogues carry different lengths). Pooling then covers
        only the frames that fit inside the real samples, so sample-axis
        zero padding cannot pollute the mean/std with silence."""
        squeeze = wav.ndim == 2
        if squeeze:
            wav = wav[None]
        L, B, T = wav.shape
        feats = mfcc(wav.reshape(L * B, T), self.cfg,
                     use_pallas=self.use_pallas)  # [L*B, F, n_mfcc]
        F = feats.shape[1]
        if wav_len is None:
            mean = jnp.mean(feats, axis=1)
            var = jnp.mean(jnp.square(feats - mean[:, None]), axis=1)
        else:
            n_valid = jnp.maximum(
                1 + (wav_len.astype(jnp.int32) - self.cfg.win_length)
                // self.cfg.hop, 0)  # frames per dialogue, [B]
            fmask = (jnp.arange(F)[None, :] < n_valid[:, None]).astype(
                feats.dtype)  # [B, F]
            fmask = jnp.tile(fmask, (L, 1))[:, :, None]  # [L*B, F, 1]
            denom = jnp.maximum(jnp.sum(fmask, axis=1), 1.0)
            mean = jnp.sum(feats * fmask, axis=1) / denom
            var = jnp.sum(
                jnp.square(feats - mean[:, None]) * fmask, axis=1) / denom
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        out = jnp.concatenate([mean, std], axis=-1).reshape(
            L, B, self.out_dim)
        return out[0] if squeeze else out


FRONTENDS = {"mfcc": MFCCFrontend}


def make_frontend(name: str | None, **kwargs):
    if name in (None, "", "none"):
        return None
    if name not in FRONTENDS:
        raise KeyError(
            f"unknown audio frontend '{name}'; available: {sorted(FRONTENDS)}")
    return FRONTENDS[name](**kwargs)
