"""Polyphase rational resampling as a single dilated strided convolution.

The oracle (scipy ``resample_poly``) designs a Kaiser-window linear-phase low-pass FIR,
zero-stuffs the input by ``up``, convolves, and keeps every ``down``-th sample centred on the
filter's group delay. Here the identical filter is designed once on the host (float64 SciPy,
cached per rate pair — the same design-on-host trick the reference uses for IIR coefficients,
reference src/mpcg_wav2vec/signalproc/torchproc.py:32-35) and the whole stuff/filter/decimate
pipeline collapses into one ``lax.conv_general_dilated`` call: ``lhs_dilation=up`` performs the
zero-stuffing implicitly and ``window_strides=down`` the decimation, so XLA lowers it to an
MXU-friendly strided convolution with no materialised intermediate.

Output matches ``scipy.signal.resample_poly(x, up, down)`` (length ``ceil(T*up/down)``,
group-delay-centred) to float32 tolerance.
"""

from __future__ import annotations

from functools import lru_cache
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import firwin


@lru_cache(maxsize=None)
def polyphase_filter(up: int, down: int) -> np.ndarray:
    """The exact FIR scipy's resample_poly designs: kaiser(5.0), cutoff 1/max_rate, gain up."""
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    return (h * up).astype(np.float64)


def resample_factors(fs_in: float, fs_out: float) -> tuple[int, int]:
    up, down = int(round(fs_out)), int(round(fs_in))
    g = gcd(up, down)
    return up // g, down // g


def resample(x: jnp.ndarray, fs_in: float, fs_out: float) -> jnp.ndarray:
    """Resample ``[..., T]`` from ``fs_in`` to ``fs_out`` (scipy resample_poly semantics)."""
    if fs_in == fs_out:
        return x
    up, down = resample_factors(fs_in, fs_out)
    h = polyphase_filter(up, down)
    half_len = (len(h) - 1) // 2

    T = x.shape[-1]
    n_out = -(-T * up // down)                      # ceil
    stuffed_len = (T - 1) * up + 1
    # Correlation kernel = flipped filter; pad so output i sits at full-conv index
    # half_len + i*down (the filter's centre), exactly like scipy.
    pad_l = half_len
    pad_r = max(0, (n_out - 1) * down + len(h) - 1 - pad_l - stuffed_len + 1)

    lead = x.shape[:-1]
    lhs = x.reshape((-1, 1, T))
    rhs = jnp.asarray(h[::-1].copy(), dtype=x.dtype).reshape((1, 1, -1))
    out = jax.lax.conv_general_dilated(
        lhs.astype(x.dtype), rhs,
        window_strides=(down,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :n_out].reshape(lead + (n_out,))
