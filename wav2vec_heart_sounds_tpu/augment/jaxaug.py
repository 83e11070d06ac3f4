"""Batched on-device waveform augmentation with explicit PRNG keys.

Device twin of the tensor-friendly augmentation subset, matching the reference's torchaug
semantics (src/mpcg_wav2vec/augment/torchaug.py:30-111): additive white noise, sinusoidal
volume modulation, baseline wander, cubic-gain amplitude warp (depthwise conv) and random
parametric EQ (1st-order Butterworth band sections, shared across the batch), each applied
through an independent per-sample Bernoulli mask so unaugmented rows pass through untouched.

Everything is jit-compiled; randomness is threaded through ``jax.random`` keys — no host
round-trips, so the whole ``augment_pcg_batch`` fuses into the training step. Time-stretch and
HPSS have no exact tensor form and stay on the NumPy path (:mod:`.pipelines`), exactly as the
reference scopes them (torchaug.py:9-11).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.iir import biquad_dynamic, butter1_bandpass_coeffs
from ..ops.normalize import abs_max_normalise as _normalise
from .pipelines import AugmentConfig

NOISE_STDS = (0.0001, 0.001, 0.01)


def _apply(key: jax.Array, x: jnp.ndarray, transformed: jnp.ndarray, prob: float) -> jnp.ndarray:
    """Blend transformed vs untouched rows with a per-sample Bernoulli mask, then normalise."""
    mask = (jax.random.uniform(key, (x.shape[0], 1)) < prob).astype(x.dtype)
    return _normalise(mask * transformed + (1.0 - mask) * x)


def add_white_noise(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    k_std, k_scale, k_noise = jax.random.split(key, 3)
    std = jax.random.choice(k_std, jnp.asarray(NOISE_STDS, dtype=x.dtype))
    scale = jax.random.uniform(k_scale, (x.shape[0], 1), dtype=x.dtype) * 0.1
    return x + scale * std * jax.random.normal(k_noise, x.shape, dtype=x.dtype)


def _two_band_sines(key: jax.Array, b: int, t: jnp.ndarray, amp_lo: float,
                    amp_span: float) -> jnp.ndarray:
    """Per-sample fast (0.05-0.5 Hz) + slow (0.001-0.05 Hz) random sinusoids ``[B, T]``."""
    out = jnp.zeros((b, t.shape[0]), dtype=t.dtype)
    for i, (lo, hi) in enumerate(((0.05, 0.5), (0.001, 0.05))):
        ka, kf, kp = jax.random.split(jax.random.fold_in(key, i), 3)
        amp = amp_lo + jax.random.uniform(ka, (b, 1), dtype=t.dtype) * amp_span
        freq = lo + jax.random.uniform(kf, (b, 1), dtype=t.dtype) * (hi - lo)
        phase = jax.random.uniform(kp, (b, 1), dtype=t.dtype)
        out = out + amp * jnp.sin(2 * jnp.pi * (freq * t + phase))
    return out


def sinusoidal_envelope(key: jax.Array, x: jnp.ndarray, fs: int) -> jnp.ndarray:
    t = jnp.arange(x.shape[-1], dtype=x.dtype) / fs
    return x * (1.0 + _two_band_sines(key, x.shape[0], t, 0.01, 0.24))


def baseline_wander(key: jax.Array, x: jnp.ndarray, fs: int) -> jnp.ndarray:
    t = jnp.arange(x.shape[-1], dtype=x.dtype) / fs
    return x + _two_band_sines(key, x.shape[0], t, 0.01, 0.19)


def amplitude_warp(key: jax.Array, x: jnp.ndarray, num_points: int = 12,
                   kernel: int = 65) -> jnp.ndarray:
    """Per-sample smooth unit-sum gain curve applied as a depthwise 1-D convolution."""
    b, t = x.shape
    amps = 0.7 + jax.random.uniform(key, (b, num_points), dtype=x.dtype) * 0.6
    grid = jnp.arange(kernel, dtype=x.dtype) / (kernel - 1) * (num_points - 1)
    lo = jnp.clip(jnp.floor(grid).astype(jnp.int32), 0, num_points - 1)
    hi = jnp.clip(jnp.ceil(grid).astype(jnp.int32), 0, num_points - 1)
    frac = grid - lo
    curve = amps[:, lo] + (amps[:, hi] - amps[:, lo]) * frac[None, :]       # [B, K]
    curve = curve / jnp.sum(curve, axis=-1, keepdims=True)

    padded = jnp.pad(x, [(0, 0), (kernel // 2, kernel // 2)], mode="reflect")
    out = jax.lax.conv_general_dilated(
        padded[None, :, :], curve[:, None, :],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=b,
    )
    return out[0, :, :t]


def parametric_eq(key: jax.Array, x: jnp.ndarray, fs: float, low: float, high: float,
                  num_bands: int = 5) -> jnp.ndarray:
    """Blend with a stack of random narrow band sections (edges shared across the batch)."""
    nyq = fs / 2.0
    # Keep the random band inside the open (0, Nyquist) interval at any sampling rate
    # (same guard as the host pipeline's parametric_eq).
    high = min(high, 0.99 * nyq)
    low = min(low, 0.5 * high)
    coloured = x
    for i in range(num_bands):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        b_low = jax.random.uniform(k1, (), dtype=x.dtype, minval=low, maxval=0.95 * high)
        b_high = jax.random.uniform(k2, (), dtype=x.dtype,
                                    minval=b_low + 0.05 * (high - low), maxval=high)
        b, a = butter1_bandpass_coeffs(b_low / nyq, b_high / nyq)
        coloured = biquad_dynamic(coloured, b, a)
    return _normalise(_normalise(coloured) / 50.0 + _normalise(x))


def _participation(key: jax.Array, b: int, row_mask, pristine_prob):
    """Which batch rows take the augmentation at all (``None`` = every row).

    ``pristine_prob`` (per-epoch policies, e.g. the raw wire with no host expansion)
    overrides ``row_mask``: a fresh Bernoulli draw keeps ~that fraction of rows pristine,
    mirroring the host expansion where 1/(aug_num+1) of draws are the original. With an
    expansion plan, ``row_mask`` is the loader's replica flag and originals pass through
    untouched exactly as the host path leaves them."""
    if pristine_prob is not None:
        return jax.random.uniform(key, (b,)) >= pristine_prob
    if row_mask is not None:
        return row_mask > 0.5
    return None


def _gate_shared(key: jax.Array, b: int, c: int, prob: float):
    """[B*C, 1] boolean gate drawn per original sample, shared across its channel rows."""
    g = jax.random.uniform(key, (b, 1, 1)) < prob
    return jnp.broadcast_to(g, (b, c, 1)).reshape(b * c, 1)


@partial(jax.jit, static_argnames=("b", "fs", "prob_noise", "prob_wander", "prob_real"))
def _augment_multi_batch(key: jax.Array, y: jnp.ndarray, b: int, fs: int,
                         prob_noise: float, prob_wander: float, prob_real: float,
                         noise_bank: jnp.ndarray | None = None) -> jnp.ndarray:
    """Channel-flattened [B*C, T] core of :func:`augment_multi_pcg_batch`.

    Stage order matches the tail of the host pipeline after the host residue
    (normalise -> noise -> warp) has run: wander -> noise -> recorded noise — so the
    split pipeline composes to the reference's full order
    (pipelines.augment_multi_pcg; reference src/mpcg_wav2vec/augment/pipelines.py).
    Per-stage renormalisation also mirrors the host stages: wander and recorded-noise
    renormalise, white noise does not."""
    y = _normalise(y)
    keys = jax.random.split(key, 6)
    c = y.shape[0] // b
    # Probabilities are static: zero-probability stages drop out of the trace entirely.
    if prob_wander > 0:
        t = jnp.arange(y.shape[-1], dtype=y.dtype) / fs
        mod = 1.0 + _two_band_sines(keys[0], b, t, 0.01, 0.24)  # one envelope per sample
        wandered = _normalise((y.reshape(b, c, -1) * mod[:, None, :]).reshape(b * c, -1))
        y = jnp.where(_gate_shared(keys[1], b, c, prob_wander), wandered, y)
    if prob_noise > 0:
        y = jnp.where(_gate_shared(keys[2], b, c, prob_noise / 4),
                      add_white_noise(keys[3], y), y)
    if noise_bank is not None and prob_real > 0:
        idx = jax.random.randint(keys[4], (b,), 0, noise_bank.shape[0])
        snip = noise_bank[idx].astype(y.dtype)                # [B, T] shared across mics
        mixed = _normalise((y.reshape(b, c, -1) + snip[:, None, :]).reshape(b * c, -1))
        y = jnp.where(_gate_shared(keys[5], b, c, prob_real), mixed, y)
    return y


def augment_multi_pcg_batch(key: jax.Array, x: jnp.ndarray, fs: int,
                            cfg: AugmentConfig | None = None, *,
                            row_mask: jnp.ndarray | None = None,
                            pristine_prob: float | None = None,
                            noise_bank: jnp.ndarray | None = None) -> jnp.ndarray:
    """Device twin of the vest pipeline (:func:`..augment.pipelines.augment_multi_pcg`)
    for a multichannel batch ``[B, T, C]``.

    The channel-shared transforms — the sinusoidal wander envelope, white noise and
    recorded-noise mixing from a pre-cut on-device ``noise_bank`` ([K, T], see
    :func:`..augment.noise_sources.pcg_noise_bank`), gated identically across mics so
    inter-channel phase is preserved (reference src/mpcg_wav2vec/augment/pipelines.py:
    117-148 semantics) — vectorise over channels here; micro time-stretch has no tensor
    form and stays on the host path (:func:`..data.vest.multi_augment_host_residual`),
    exactly as the reference scopes torch-side augmentation (torchaug.py:9-11).
    ``row_mask`` (the loader's replica flag) keeps pristine originals untouched.
    """
    from .pipelines import (MULTI_PROB_NOISE, MULTI_PROB_REAL_NOISE,
                            MULTI_PROB_WANDER)

    b, t, c = x.shape
    k_part, k_aug = jax.random.split(key)
    y = jnp.swapaxes(x, 1, 2).reshape(b * c, t)
    y = _augment_multi_batch(k_aug, y, b, fs, MULTI_PROB_NOISE, MULTI_PROB_WANDER,
                             MULTI_PROB_REAL_NOISE, noise_bank)
    y = jnp.swapaxes(y.reshape(b, c, t), 1, 2)
    part = _participation(k_part, b, row_mask, pristine_prob)
    return y if part is None else jnp.where(part[:, None, None], y, x)


@partial(jax.jit, static_argnames=("fs", "prob_noise", "prob_wandering_volume", "prob_banding"))
def _augment_pcg_batch(key: jax.Array, x: jnp.ndarray, fs: int, prob_noise: float,
                       prob_wandering_volume: float, prob_banding: float) -> jnp.ndarray:
    x = _normalise(x)
    keys = jax.random.split(key, 8)
    # Probabilities are static: zero-probability stages drop out of the trace entirely
    # (the EQ biquad scan in particular is the expensive trace).
    if prob_noise > 0:
        x = _apply(keys[0], x, add_white_noise(keys[1], x), prob_noise / 4)
    if prob_wandering_volume > 0:
        x = _apply(keys[2], x, sinusoidal_envelope(keys[3], x, fs), prob_wandering_volume)
    if prob_banding > 0:
        x = _apply(keys[4], x, parametric_eq(keys[5], x, fs, 2, 500), prob_banding)
    if prob_noise > 0:
        x = _apply(keys[6], x, add_white_noise(keys[7], x), prob_noise / 4)
    return x


def augment_pcg_batch(key: jax.Array, x: jnp.ndarray, fs: int,
                      cfg: AugmentConfig | None = None, *,
                      row_mask: jnp.ndarray | None = None,
                      pristine_prob: float | None = None) -> jnp.ndarray:
    """Apply the on-device PCG augmentation subset to a batch ``[B, T]``.

    ``row_mask``/``pristine_prob`` select which rows participate at all (see
    :func:`_participation`); non-participating rows pass through bit-identical —
    no renormalisation — like the host path's pristine originals."""
    cfg = cfg or AugmentConfig()
    k_part, k_aug = jax.random.split(key)
    y = _augment_pcg_batch(k_aug, x, fs, cfg.prob_noise,
                           cfg.prob_wandering_volume, cfg.prob_banding)
    part = _participation(k_part, x.shape[0], row_mask, pristine_prob)
    return y if part is None else jnp.where(part[:, None], y, x)
