"""Patient-level, label-stratified train/valid/test split CSVs.

Output contract (what the loaders read, reference src/mpcg_wav2vec/datasets/splits.py:21-114):
a CSV with columns ``patient, label, split[, split2, …]`` where each ``split<n>`` column is an
independent patient-level assignment valued train/valid/test, stratified by label, drawn from
``default_rng(seed + fold)``. Input is CinC-style ``REFERENCE.csv`` label files
(rows ``record,label``, label in {-1, 1}) or an explicit record->label mapping.

Implementation is vectorised: one permutation per (fold, class), subset names assigned by
boundary slicing into a name array, and the whole table built column-wise with pandas maps —
no per-record Python loop.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class SplitRatios:
    train: float = 0.6
    valid: float = 0.2
    test: float = 0.2

    def __post_init__(self):
        total = self.train + self.valid + self.test
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"split ratios must sum to 1.0, got {total}")

    def subset_names(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """``n`` shuffled train/valid/test assignments at these ratios."""
        n_test = int(round(n * self.test))
        n_valid = int(round(n * self.valid))
        names = np.full(n, "train", dtype=object)
        names[:n_test] = "test"
        names[n_test:n_test + n_valid] = "valid"
        return rng.permutation(names)                  # random positions, exact counts


def read_cinc_labels(data_dir: str) -> dict[str, int]:
    """Read ``<data_dir>/REFERENCE.csv`` rows ``record,label`` into {record: label}."""
    path = os.path.join(data_dir, "REFERENCE.csv")
    with open(path, newline="") as fh:
        labels = {row[0].strip(): int(row[1])
                  for row in csv.reader(fh) if len(row) >= 2 and row[0]}
    if not labels:
        raise ValueError(f"no labels read from {path}")
    return labels


def make_splits(
    labels: dict[str, int],
    *,
    folds: int = 5,
    ratios: SplitRatios | None = None,
    seed: int = 42,
    patient_fn=None,
) -> pd.DataFrame:
    """Stratified patient-level split table, one independent column per fold.

    All records of a patient land in the same subset; stratification is by the patient's
    label (a patient's records share a label in these datasets — the first record's label
    is taken). Each fold draws from its own ``default_rng(seed + fold)``.
    """
    ratios = ratios or SplitRatios()
    table = pd.DataFrame({"patient": sorted(labels)})
    table["label"] = table["patient"].map(labels)
    subject = table["patient"].map(patient_fn) if patient_fn else table["patient"]

    # One row per subject, first record's label (rows are already record-sorted).
    per_subject = (pd.DataFrame({"subject": subject, "label": table["label"]})
                   .drop_duplicates("subject"))

    for fold in range(1, folds + 1):
        rng = np.random.default_rng(seed + fold)
        assignment: dict[str, str] = {}
        for _, group in per_subject.groupby("label", sort=True):
            members = group["subject"].to_numpy()
            assignment.update(zip(members, ratios.subset_names(len(members), rng)))
        table["split" if fold == 1 else f"split{fold}"] = subject.map(assignment)
    return table


def write_splits(df: pd.DataFrame, out_path: str | Path) -> str:
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(out, index=False)
    return str(out)


def make_splits_from_dirs(data_dirs: list[str], **kwargs) -> pd.DataFrame:
    """Merge CinC ``REFERENCE.csv`` labels from several directories, then split."""
    merged: dict[str, int] = {}
    for d in data_dirs:
        merged.update(read_cinc_labels(d))
    return make_splits(merged, **kwargs)
