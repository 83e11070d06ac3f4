"""Batched amplitude normalisers (device twin of :mod:`..signal.normalize`).

Semantics match the reference's tensor twin (src/mpcg_wav2vec/signalproc/torchproc.py:59-63,
normalize.py:52-84): NaNs are zeroed (not interpolated) on the batched path, reductions run
along the trailing time axis.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def abs_max_normalise(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean, peak-normalise and clip each row of ``[..., T]``."""
    x = jnp.nan_to_num(x)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    peak = jnp.clip(jnp.max(jnp.abs(x), axis=-1, keepdims=True), min=1e-12)
    return jnp.clip(x / peak, -1.0, 1.0)


def minmax_normalise(x: jnp.ndarray, lo: float = -1.0, hi: float = 1.0) -> jnp.ndarray:
    mn = jnp.min(x, axis=-1, keepdims=True)
    span = jnp.max(x, axis=-1, keepdims=True) - mn
    return (x - mn) / (span + EPS) * (hi - lo) + lo


def z_normalise(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.std(x, axis=-1, keepdims=True)
    return (x - mean) / (std + EPS)


def kpeak_normalise(x: jnp.ndarray, k: int = 26, lo: float = -1.0, hi: float = 1.0) -> jnp.ndarray:
    """Rescale by the mean of the k largest / smallest entries (over the whole array,
    matching the reference torch variant's global top-k)."""
    flat = x.reshape(-1)
    top = jnp.sort(flat)
    hi_ref = jnp.mean(top[-k:])
    lo_ref = jnp.mean(top[:k])
    return lo + (x - lo_ref) / (hi_ref - lo_ref + EPS) * (hi - lo)


def fit_length(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero-pad or crop the trailing axis to exactly ``length`` samples."""
    T = x.shape[-1]
    if T < length:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, length - T)]
        return jnp.pad(x, pad)
    return x[..., :length]
