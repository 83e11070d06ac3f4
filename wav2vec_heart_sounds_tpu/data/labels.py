"""Label vocabularies and balanced sampling weights.

Contract from reference src/mpcg_wav2vec/datasets/labels.py:19-56: binary classification
(0 = normal, 1 = abnormal); the diffusion generators condition on dataset-specific label
vocabularies whose index order fixes embedding rows. The torch WeightedRandomSampler becomes a
host-side weight vector consumed by :class:`.loader.BalancedSampler`.
"""

from __future__ import annotations

import itertools

import numpy as np

BINARY_LABELS = (0, 1)

LABEL_SETS: dict[str, tuple] = {
    "training-a": (-1, 1),
    "training-a-extended": ("Normal", "Benign", "MVP", "MPC", "AD"),
    "ticking-heart-multi": (-1, 1),
    "ticking-heart-extended": tuple(
        f"C{a}X{b}{s}" for a, b in itertools.permutations(range(1, 7), 2) for s in "NA"
    ),
    "cinc-channels": tuple(f"{c}{s}" for c in (2, 3, 4, 5, 6) for s in "NA"),
    "multichannel-mixed": (0, 1, 2),
}


def label_set(dataset: str) -> tuple:
    try:
        return LABEL_SETS[dataset]
    except KeyError as exc:
        raise NotImplementedError(f"No label vocabulary for dataset '{dataset}'") from exc


def num_classes(dataset: str) -> int:
    return len(label_set(dataset))


def label_to_index(dataset: str, label) -> int:
    return label_set(dataset).index(label)


def index_to_label(dataset: str, index: int):
    return label_set(dataset)[index]


def balance_weights(labels) -> np.ndarray:
    """Per-item sampling weights drawing every class with equal probability."""
    labels = np.asarray(list(labels), dtype=np.int64)
    counts = np.bincount(labels).astype(np.float64)
    counts = np.clip(counts, 1.0, None)
    return (1.0 / counts)[labels]
