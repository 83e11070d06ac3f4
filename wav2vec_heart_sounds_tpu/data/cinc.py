"""CinC 2016 loaders: single-channel PCG and synchronised Training-A PCG+ECG.

Behavioral contract from reference src/mpcg_wav2vec/datasets/cinc.py:29-167. On-disk layout is
the PhysioNet CinC 2016 format (``<patient>.hea`` + signal file, read by the framework's own
WFDB reader) plus a reference CSV with ``patient``, a binary label column
(``abnormality``/``label``/``diagnosis``) and per-fold ``split`` columns valued
train/valid/test. Full records are balance-augmented *before* windowing, then segmented.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from tqdm import tqdm

from ..augment import AugmentConfig, augment_pcg, augment_pcg_ecg
from ..signal import WindowSpec, segment
from . import wfdb_io
from .fragments import Fragment, FragmentDataset, class_counts


def _use_native() -> bool:
    from .. import native

    return os.environ.get("W2VHS_NO_NATIVE") != "1" and native.available()


def preprocess_pcg(x, fs_in, fs_out):
    """PCG chain via the C++ fast path when available, NumPy oracle otherwise."""
    if _use_native():
        from .. import native

        return native.preprocess_pcg(x, fs_in, fs_out)
    from ..signal import preprocess_pcg as oracle

    return oracle(x, fs_in, fs_out)


def preprocess_ecg(x, fs_in, fs_out):
    if _use_native():
        from .. import native

        return native.preprocess_ecg(x, fs_in, fs_out)
    from ..signal import preprocess_ecg as oracle

    return oracle(x, fs_in, fs_out)

LABEL_COLUMNS = ("abnormality", "label", "diagnosis")


def read_split(csv_path: str, subset: str, fold: int = 1) -> pd.DataFrame:
    df = pd.read_csv(csv_path, comment="#")
    if subset != "all":
        col = "split" if fold == 1 else f"split{fold}"
        df = df[df[col] == subset]
    return df


def label_column(df: pd.DataFrame) -> str:
    for col in LABEL_COLUMNS:
        if col in df.columns:
            return col
    raise KeyError(f"No label column ({LABEL_COLUMNS}) in split CSV columns {list(df.columns)}")


def binary_label(raw) -> int:
    """Map CinC labels to {0: normal, 1: abnormal}; accepts -1/1 or 0/1 encodings."""
    return 1 if int(raw) == 1 else 0


def read_record(data_dir: str, patient: str) -> tuple[np.ndarray, float]:
    rec = wfdb_io.read_record(os.path.join(data_dir, str(patient)))
    return rec.p_signal, rec.fs


def pcg_augment(wave: np.ndarray, fs: int, cfg: AugmentConfig,
                rng: np.random.Generator | None = None) -> np.ndarray:
    """Augment a mono PCG window or a [T, 2] PCG+ECG pair (shared transform)."""
    if wave.ndim == 2:
        ecg_aug, pcg_aug = augment_pcg_ecg(wave[:, 1], wave[:, 0], fs, cfg, rng=rng)
        n = min(len(pcg_aug), len(ecg_aug))
        return np.stack([pcg_aug[:n], ecg_aug[:n]], axis=1)
    return augment_pcg(wave, fs, cfg, rng=rng)


def _segment_into(fragments: list[Fragment], signal: np.ndarray, fs: int,
                  window: WindowSpec, label: int, patient: str) -> None:
    for w in segment(signal, fs, window):
        fragments.append(Fragment(waveform=w, label=label, patient=patient))


def build_fragments(
    data_dir: str,
    csv_path: str,
    subset: str,
    *,
    fs_out: int,
    window: WindowSpec,
    ecg: bool = False,
    fold: int = 1,
    augment_num: int = 0,
    augment_config: AugmentConfig | None = None,
    balance_augment: bool = True,
    rng: np.random.Generator | None = None,
) -> list[Fragment]:
    """Load, optionally augment full patient records (balanced), then window into fragments.

    Missing or unreadable records are skipped (defensive-skip policy, reference
    datasets/cinc.py:82-84).
    """
    df = read_split(csv_path, subset, fold)
    col = label_column(df)
    cfg = augment_config or AugmentConfig()
    labels = [binary_label(v) for v in df[col]]
    counts = class_counts(labels)
    max_count = max(counts.values()) if counts else 1

    fragments: list[Fragment] = []
    kind = "PCG+ECG" if ecg else "PCG"
    for _, row in tqdm(df.iterrows(), total=len(df),
                       desc=f"Loading CinC {kind} [{subset}]", unit="rec"):
        patient = str(row["patient"])
        label = binary_label(row[col])
        try:
            signal, fs = read_record(data_dir, patient)
        except (FileNotFoundError, ValueError, OSError):
            continue

        pcg = preprocess_pcg(signal[:, 0], fs, fs_out)
        if ecg and signal.shape[1] > 1:
            ecg_sig = preprocess_ecg(signal[:, 1], fs, fs_out)
            n = min(len(pcg), len(ecg_sig))
            base = np.stack([pcg[:n], ecg_sig[:n]], axis=1)            # [T, 2]
        else:
            base = pcg                                                  # [T]

        _segment_into(fragments, base, fs_out, window, label, patient)

        copies = augment_num
        if balance_augment and counts.get(label, 0) > 0:
            copies = int(round(augment_num * max_count / counts[label]))
        for k in range(copies):
            aug = pcg_augment(base, fs_out, cfg, rng=rng)
            _segment_into(fragments, aug, fs_out, window, label, f"{patient}#aug{k + 1}")
    return fragments


def cinc_dataset(
    data_dir: str,
    csv_path: str,
    subset: str,
    *,
    fs_out: int,
    window: WindowSpec,
    ecg: bool = False,
    fold: int = 1,
    augment_num: int = 0,
    augment_config: AugmentConfig | None = None,
    channel: int = -1,
) -> FragmentDataset:
    fragments = build_fragments(
        data_dir, csv_path, subset, fs_out=fs_out, window=window, ecg=ecg, fold=fold,
        augment_num=augment_num, augment_config=augment_config,
    )
    return FragmentDataset(fragments, fs=fs_out, channel=channel)
