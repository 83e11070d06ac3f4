"""In-memory fragment dataset shared by the CinC and vest classifiers.

Behavioral contract from reference src/mpcg_wav2vec/datasets/fragments.py:23-90: a *fragment*
is one fixed-length window with its binary label and source patient; the dataset optionally
materialises lazily-augmented copies (class-balanced so the minority class receives more), an
optional cache pins each augmented copy after first draw, and a per-item channel selector
collapses multichannel fragments.

Framework-agnostic: items are NumPy; batching for the TPU is handled by :mod:`.loader`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

AugmentFn = Callable[[np.ndarray, int], np.ndarray]


@dataclass
class Fragment:
    waveform: np.ndarray   # [T] (mono) or [T, C] (multichannel)
    label: int
    patient: str


def class_counts(labels) -> dict[int, int]:
    counts: dict[int, int] = {}
    for label in labels:
        counts[label] = counts.get(label, 0) + 1
    return counts


class FragmentDataset:
    """Sequence of training items with lazy, per-epoch-fresh augmentation."""

    def __init__(
        self,
        fragments: Sequence[Fragment],
        fs: int,
        augment_num: int = 0,
        augment_fn: AugmentFn | None = None,
        balance: bool = True,
        channel: int = -1,
        cache_augmented: bool = False,
    ):
        self.fs = fs
        self.augment_fn = augment_fn
        self.channel = channel
        self.cache_augmented = cache_augmented
        self._cache: dict[int, np.ndarray] = {}
        self._items: list[tuple[Fragment, bool]] = []

        counts = class_counts(f.label for f in fragments)
        max_count = max(counts.values()) if counts else 1
        for frag in fragments:
            self._items.append((frag, False))
            if augment_num > 0 and augment_fn is not None:
                copies = augment_num
                if balance and counts.get(frag.label, 0) > 0:
                    copies = int(round(augment_num * max_count / counts[frag.label]))
                self._items.extend((frag, True) for _ in range(copies))

    @property
    def labels(self) -> list[int]:
        return [frag.label for frag, _ in self._items]

    def __len__(self) -> int:
        return len(self._items)

    def __getitem__(self, idx: int) -> dict:
        frag, augmented = self._items[idx]
        wave = frag.waveform
        if augmented and self.augment_fn is not None:
            if self.cache_augmented and idx in self._cache:
                wave = self._cache[idx]
            else:
                wave = self.augment_fn(wave, self.fs)
                if self.cache_augmented:
                    wave = np.ascontiguousarray(np.asarray(wave, dtype=np.float32))
                    self._cache[idx] = wave
        wave = np.asarray(wave, dtype=np.float32)
        if wave.ndim == 2 and self.channel != -1:
            wave = wave[:, self.channel]
        return {
            "waveform": np.ascontiguousarray(wave),
            "label": int(frag.label),
            "patient": frag.patient,
        }
