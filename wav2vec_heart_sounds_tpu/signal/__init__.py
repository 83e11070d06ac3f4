"""Signal-processing oracle (NumPy) + the batched JAX device twin.

This package is dual-path by design, mirroring the defining structural feature of the
reference (SURVEY.md §1): the scalar NumPy implementations here are the behavioral ground
truth used by dataset builders at load time, and :mod:`.jaxproc` is the jit-compiled batched
twin that runs whole batches on TPU. Equivalence tests pin the two paths to agree
(corr > 0.999, max-abs-diff < 5e-3 — reference tests/test_torchaug.py:26-36).
"""

from .despike import remove_spikes
from .envelopes import hilbert_envelope, homomorphic_envelope
from .filters import (
    ECG_BAND,
    PCG_BAND,
    band_stop,
    bandpass_cascade,
    butter_bandpass,
    butter_highpass,
    butter_lowpass,
    decompose_bands,
    fir_subbands,
    notch,
    notch_chain,
)
from .normalize import (
    abs_max_normalise,
    interpolate_nans,
    kpeak_normalise,
    minmax_normalise,
    z_normalise,
)
from .preprocess import (
    fit_length,
    preprocess_ecg,
    preprocess_four_bands,
    preprocess_pcg,
)
from .resample import resample, resample_factors
from .segment import WindowSpec, segment, window_starts
from .spectrogram import MelConfig, add_chirp, log_mel, mel_filterbank, mel_spectrogram

__all__ = [
    "remove_spikes",
    "hilbert_envelope",
    "homomorphic_envelope",
    "PCG_BAND",
    "ECG_BAND",
    "bandpass_cascade",
    "butter_bandpass",
    "butter_lowpass",
    "butter_highpass",
    "band_stop",
    "notch",
    "notch_chain",
    "fir_subbands",
    "decompose_bands",
    "abs_max_normalise",
    "interpolate_nans",
    "minmax_normalise",
    "z_normalise",
    "kpeak_normalise",
    "preprocess_pcg",
    "preprocess_ecg",
    "preprocess_four_bands",
    "fit_length",
    "resample",
    "resample_factors",
    "WindowSpec",
    "segment",
    "window_starts",
    "MelConfig",
    "mel_spectrogram",
    "mel_filterbank",
    "log_mel",
    "add_chirp",
]
