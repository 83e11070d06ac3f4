"""Shared dataset-builder plumbing: split-CSV protocol, label mapping, preprocess dispatch.

The loaders (:mod:`.cinc`, :mod:`.vest`, :mod:`.generated`, :mod:`.generative`) all speak the
same on-disk protocol — a reference CSV with a ``patient`` column, a binary label column
(one of ``abnormality``/``label``/``diagnosis``), and per-fold ``split``/``split<n>`` columns
valued train/valid/test (format of reference src/mpcg_wav2vec/datasets/cinc.py:29-51) — and
all route waveform preprocessing through the C++ fast path (:mod:`..native`) when it is
available, falling back to the NumPy oracle. That shared plumbing lives here once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

LABEL_COLUMNS = ("abnormality", "label", "diagnosis")


def read_split(csv_path: str, subset: str, fold: int = 1) -> pd.DataFrame:
    """Rows of the reference CSV assigned to ``subset`` in fold ``fold`` (or every row)."""
    df = pd.read_csv(csv_path, comment="#")
    if subset == "all":
        return df
    return df[df["split" if fold == 1 else f"split{fold}"] == subset]


def label_column(df: pd.DataFrame) -> str:
    for col in LABEL_COLUMNS:
        if col in df.columns:
            return col
    raise KeyError(f"No label column ({LABEL_COLUMNS}) in split CSV columns {list(df.columns)}")


def binary_label(raw) -> int:
    """CinC label -> {0: normal, 1: abnormal}; accepts the -1/1 and 0/1 encodings."""
    return 1 if int(raw) == 1 else 0


def subjects_and_labels(df: pd.DataFrame) -> list[tuple[str, int]]:
    """(patient, binary label) pairs in CSV row order."""
    col = label_column(df)
    return [(str(p), binary_label(v)) for p, v in zip(df["patient"], df[col])]


def balanced_copy_counts(labels: list[int], augment_num: int) -> np.ndarray:
    """Augmented copies per record so every class contributes equally many copies.

    The majority class gets ``augment_num`` copies per record; rarer classes get
    proportionally more (``round(augment_num * max_count / class_count)``).
    """
    arr = np.asarray(labels, dtype=np.int64)
    if augment_num <= 0 or len(arr) == 0:
        return np.zeros(len(arr), dtype=np.int64)
    counts = np.bincount(arr)
    return np.round(augment_num * counts.max() / counts[arr]).astype(np.int64)


def progress(iterable, desc: str, unit: str = "rec", total: int | None = None):
    """tqdm when a tty wants it; plain passthrough otherwise (keeps logs clean)."""
    try:
        from tqdm import tqdm

        return tqdm(iterable, desc=desc, unit=unit, total=total)
    except ImportError:                               # pragma: no cover
        return iterable


def _native_enabled() -> bool:
    from .. import native

    return os.environ.get("W2VHS_NO_NATIVE") != "1" and native.available()


def pcg_chain(x: np.ndarray, fs_in: float, fs_out: float) -> np.ndarray:
    """Full PCG preprocessing chain — C++ fast path when available, oracle otherwise."""
    if _native_enabled():
        from .. import native

        return native.preprocess_pcg(x, fs_in, fs_out)
    from ..signal import preprocess_pcg

    return preprocess_pcg(x, fs_in, fs_out)


def ecg_chain(x: np.ndarray, fs_in: float, fs_out: float) -> np.ndarray:
    if _native_enabled():
        from .. import native

        return native.preprocess_ecg(x, fs_in, fs_out)
    from ..signal import preprocess_ecg

    return preprocess_ecg(x, fs_in, fs_out)


def stack_min_length(channels: list[np.ndarray]) -> np.ndarray:
    """Stack per-channel signals to ``[T, C]`` at the shortest common length."""
    n = min(len(c) for c in channels)
    return np.stack([c[:n] for c in channels], axis=1)
