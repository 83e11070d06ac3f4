"""Batched JAX preprocessing twin — whole batches from raw waveform to encoder input on TPU.

This is the device-tensor mirror of the NumPy oracle in this package, playing the role of the
reference's ``torchproc`` (src/mpcg_wav2vec/signalproc/torchproc.py:1-129) but jit-compiled and
fused end-to-end by XLA: polyphase resample (dilated conv), batched Schmidt despike
(fixed-shape while_loop), causal Butterworth cascade (associative-scan biquads) and abs-max
normalisation compose into a single compiled program with no host round-trips.

Matches the oracle within the equivalence bar (corr > 0.999, max |diff| < 5e-3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import despike as _despike
from ..ops import iir as _iir
from ..ops import normalize as _norm
from ..ops import resample as _resample
from ..ops import segment as _segment
from ..ops import stft as _stft
from .filters import ECG_BAND, PCG_BAND
from .segment import WindowSpec
from .spectrogram import MelConfig

# Re-exported batched primitives. The heavyweight stages are jitted individually: on this
# toolchain, compiling resample+despike+IIR+normalise as ONE program is pathologically slow
# (the while_loop/conv/scan combination blows up compile time), while the pieces each
# compile quickly and XLA still keeps all intermediates on device between them. Users who
# want a single fused program can wrap the chain in their own jit (inner jits inline).
# ``aot_jit`` additionally caches the serialized TPU executables across processes (the
# relay toolchain bypasses jax's persistent compilation cache — utils/aot.py).
from ..utils.aot import aot_jit as _aot_jit  # noqa: E402

lowpass = _iir.lowpass
highpass = _iir.highpass
bandpass_cascade = _aot_jit(_iir.bandpass_cascade,
                            static_argnames=("fs", "low", "high", "order"))
resample = _aot_jit(_resample.resample, static_argnames=("fs_in", "fs_out"))
remove_spikes = _aot_jit(_despike.remove_spikes.__wrapped__,
                         static_argnames=("fs", "threshold", "max_iterations"))
abs_max_normalise = _aot_jit(_norm.abs_max_normalise)
minmax_normalise = _norm.minmax_normalise
z_normalise = _norm.z_normalise
kpeak_normalise = _norm.kpeak_normalise
fit_length = _norm.fit_length
segment = _segment.segment
log_mel = _stft.log_mel
mel_spectrogram = _stft.mel_spectrogram


def _as_batched(x: jnp.ndarray) -> tuple[jnp.ndarray, bool]:
    if x.ndim == 1:
        return x[None, :], True
    return x, False


# Paired stages (round-5 dispatch-overhead lever): every program launch through the relay
# carries fixed host+runtime cost (mode=preproc measures ~36 ms/step for <1 ms of device
# work across ~6 launches), so halving the launch count is worth real headline ms. The
# pathological compile was all FOUR stages in one jit (conv + while_loop + scan, round-1
# PERF note); the pairs below each compile fine. ``W2VHS_PREPROC_PAIRED=0`` restores the
# four individually-jitted stages.


def _pcg_head(x: jnp.ndarray, fs_in, fs_out) -> jnp.ndarray:
    x = _resample.resample(x, fs_in, fs_out)
    return _despike.remove_spikes.__wrapped__(x, fs_out)


def _pcg_tail(x: jnp.ndarray, fs) -> jnp.ndarray:
    return _norm.abs_max_normalise(_iir.bandpass_cascade(x, fs, *PCG_BAND, order=2))


pcg_head = _aot_jit(_pcg_head, static_argnames=("fs_in", "fs_out"))
pcg_tail = _aot_jit(_pcg_tail, static_argnames=("fs",))


def preprocess_pcg(x: jnp.ndarray, fs_in: float, fs_out: float, *,
                   despike: bool = True) -> jnp.ndarray:
    """PCG chain on ``[B, T]``: resample -> despike -> 25-450 Hz cascade -> abs-max.

    Composed of jitted stages (all intermediates stay on device); wrap in an outer
    ``jax.jit`` for a single fused program. Stages run pairwise by default (two launches
    per batch instead of four — see the dispatch-overhead note above).
    """
    import os

    x, squeeze = _as_batched(x)
    if despike and os.environ.get("W2VHS_PREPROC_PAIRED", "1") != "0":
        x = pcg_tail(pcg_head(x, fs_in, fs_out), fs_out)
        return x[0] if squeeze else x
    x = resample(x, fs_in, fs_out)
    if despike:
        x = remove_spikes(x, fs_out)
    x = bandpass_cascade(x, fs_out, *PCG_BAND, order=2)
    x = abs_max_normalise(x)
    return x[0] if squeeze else x


def _ecg_tail(x: jnp.ndarray, fs) -> jnp.ndarray:
    return _norm.abs_max_normalise(_iir.bandpass_cascade(x, fs, *ECG_BAND, order=2))


ecg_tail = _aot_jit(_ecg_tail, static_argnames=("fs",))


def preprocess_ecg(x: jnp.ndarray, fs_in: float, fs_out: float) -> jnp.ndarray:
    """ECG chain on ``[B, T]``: resample -> 2-40 Hz cascade -> abs-max."""
    import os

    x, squeeze = _as_batched(x)
    x = resample(x, fs_in, fs_out)
    if os.environ.get("W2VHS_PREPROC_PAIRED", "1") != "0":
        x = ecg_tail(x, fs_out)
    else:
        x = bandpass_cascade(x, fs_out, *ECG_BAND, order=2)
        x = abs_max_normalise(x)
    return x[0] if squeeze else x
