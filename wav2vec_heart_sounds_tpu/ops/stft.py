"""Batched STFT / mel-spectrogram on device (twin of :mod:`..signal.spectrogram`).

Framing is a static strided gather, the DFT is ``jnp.fft.rfft``, and the mel projection is a
single ``[freq, mel]`` matmul that XLA places on the MXU. The filterbank is built on the host
(shared :func:`..signal.spectrogram.mel_filterbank`, torchaudio-equivalent HTK triangles) and
closed over as a constant.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..signal.spectrogram import MelConfig, mel_filterbank


@lru_cache(maxsize=None)
def _window_and_fbank(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    win = np.hanning(cfg.win + 1)[:-1]
    if cfg.win < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win) // 2
        win = np.pad(win, (lpad, cfg.n_fft - cfg.win - lpad))
    fbank = mel_filterbank(cfg.n_fft // 2 + 1, cfg.f_min, cfg.f_max, cfg.n_mels, cfg.sample_rate)
    return win.astype(np.float32), fbank.astype(np.float32)


def stft_magnitude(x: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """``[..., T]`` -> ``[..., n_fft//2+1, frames]`` centred, window-normalised magnitude."""
    window, _ = _window_and_fbank(cfg)
    window = jnp.asarray(window, dtype=x.dtype)
    pad = cfg.n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - cfg.n_fft) // cfg.hop_length
    idx = cfg.hop_length * jnp.arange(n_frames)[:, None] + jnp.arange(cfg.n_fft)[None, :]
    frames = x[..., idx] * window                                   # [..., frames, n_fft]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    spec = spec / jnp.sqrt(jnp.sum(window ** 2))
    return jnp.swapaxes(spec, -1, -2)                               # [..., freq, frames]


def mel_spectrogram(x: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """``[..., T]`` -> ``[..., n_mels, frames]``."""
    _, fbank = _window_and_fbank(cfg)
    spec = stft_magnitude(x, cfg)
    return jnp.einsum("fm,...ft->...mt", jnp.asarray(fbank, dtype=spec.dtype), spec)


def log_mel(x: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Mel in dB mapped into [0, 1] (diffusion-conditioner dynamic range)."""
    mel = mel_spectrogram(x, cfg)
    mel = 20.0 * jnp.log10(jnp.clip(mel, min=1e-5)) - 20.0
    return jnp.clip((mel + 100.0) / 100.0, 0.0, 1.0)
