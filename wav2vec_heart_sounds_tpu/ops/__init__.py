"""Device-side compute kernels (JAX/XLA, Pallas where it pays).

Every op here is jit-safe, static-shaped and batched — the building blocks of the fused
raw-batch -> encoder-input preprocessing path (SURVEY.md §7 / BASELINE north star).
"""

from . import despike, iir, normalize, resample, segment, stft

__all__ = ["despike", "iir", "normalize", "resample", "segment", "stft"]
