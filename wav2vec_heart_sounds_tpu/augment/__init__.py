"""Waveform augmentation: host pipelines (NumPy) + the on-device batched twin.

Dual-path like the reference (SURVEY.md §2.2): the probabilistic per-record pipelines run on
the host at dataset-build time (HPSS / time-stretch have no exact tensor form), while
:func:`jaxaug.augment_pcg_batch` augments whole batches inside the jitted training step with
per-sample Bernoulli masks driven by explicit PRNG keys.
"""

from .pipelines import (
    AugmentConfig,
    augment_ecg,
    augment_multi_pcg,
    augment_pcg,
    augment_pcg_ecg,
)
from .jaxaug import augment_pcg_batch

__all__ = [
    "AugmentConfig",
    "augment_pcg",
    "augment_ecg",
    "augment_pcg_ecg",
    "augment_multi_pcg",
    "augment_pcg_batch",
]
