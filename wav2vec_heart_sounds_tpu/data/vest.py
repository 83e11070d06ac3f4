"""Multichannel wearable-vest PCG loader.

Behavioral contract from reference src/mpcg_wav2vec/datasets/vest.py:27-113: one multichannel
WAV per recording (integer PCM scaled to [-1, 1]); fixed channel layout (PCG microphones 1-7
in WAV columns 0-6, ECG lead ``E`` col 7, ``E2`` col 8); recordings matched to patients by
filename substring; per-channel PCG/ECG preprocessing; min-length channel stack; segmentation;
augmentation deferred to the FragmentDataset (identical transform across channels).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
from scipy.io import wavfile
from tqdm import tqdm

from ..augment import AugmentConfig, augment_multi_pcg
from ..signal import WindowSpec, segment
from .cinc import binary_label, label_column, preprocess_ecg, preprocess_pcg, read_split
from .fragments import Fragment, FragmentDataset

# Microphone / lead -> WAV column index.
VEST_CHANNEL_MAP: dict[object, int] = {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, "E": 7, "E2": 8}

ECG_LEADS = ("E", "E2")


def read_vest_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a multichannel WAV as float32 ``[T, C]`` (integer PCM scaled into [-1, 1])."""
    fs, signal = wavfile.read(path)
    if np.issubdtype(signal.dtype, np.integer):
        signal = signal.astype(np.float32) / np.iinfo(signal.dtype).max
    else:
        signal = signal.astype(np.float32)
    if signal.ndim == 1:
        signal = signal[:, None]
    return signal, fs


def patient_files(data_dir: str, patient: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if patient in f and f.lower().endswith(".wav")
    )


def build_fragments(
    data_dir: str,
    csv_path: str,
    subset: str,
    *,
    fs_out: int,
    window: WindowSpec,
    channels: list,
    fold: int = 1,
) -> list[Fragment]:
    df = read_split(csv_path, subset, fold)
    col = label_column(df)
    columns = [(c, VEST_CHANNEL_MAP[c]) for c in channels if c in VEST_CHANNEL_MAP]
    fragments: list[Fragment] = []

    for _, row in tqdm(df.iterrows(), total=len(df),
                       desc=f"Loading vest ({len(columns)}ch) [{subset}]", unit="rec"):
        patient = str(row["patient"])
        label = binary_label(row[col])
        for wav_path in patient_files(data_dir, patient):
            signal, fs = read_vest_wav(wav_path)
            processed = [
                preprocess_ecg(signal[:, idx], fs, fs_out) if name in ECG_LEADS
                else preprocess_pcg(signal[:, idx], fs, fs_out)
                for name, idx in columns
                if idx < signal.shape[1]
            ]
            if not processed:
                continue
            n = min(len(ch) for ch in processed)
            stacked = np.stack([ch[:n] for ch in processed], axis=1)    # [T, C]
            for w in segment(stacked, fs_out, window):                   # [N, win, C]
                fragments.append(Fragment(waveform=w, label=label, patient=patient))
    return fragments


def multi_augment(wave: np.ndarray, fs: int, cfg: AugmentConfig,
                  rng: np.random.Generator | None = None) -> np.ndarray:
    channels = [wave[:, i] for i in range(wave.shape[1])]
    augmented = augment_multi_pcg(channels, fs, cfg, rng=rng)
    n = min(len(c) for c in augmented)
    return np.stack([c[:n] for c in augmented], axis=1)


def vest_dataset(
    data_dir: str,
    csv_path: str,
    subset: str,
    *,
    fs_out: int,
    window: WindowSpec,
    channels: list,
    fold: int = 1,
    augment_num: int = 0,
    augment_config: AugmentConfig | None = None,
    channel: int = -1,
) -> FragmentDataset:
    fragments = build_fragments(data_dir, csv_path, subset, fs_out=fs_out, window=window,
                                channels=channels, fold=fold)
    augment_fn = partial(multi_augment, cfg=augment_config or AugmentConfig())
    return FragmentDataset(fragments, fs=fs_out, augment_num=augment_num,
                           augment_fn=augment_fn, channel=channel)
