"""Synthetic-dataset generation from a trained diffusion vocoder.

Contract from reference src/mpcg_wav2vec/generative/generate.py:22-47: iterate a
GenerativeDataset, sample ``per_item`` waveforms per item conditioned on its mel + label,
abs-max normalise, and write ``<patient>_<idx>_<copy>.wav`` plus a ``REFERENCE.csv`` manifest
(``patient,label,file``) that :func:`..data.generated.generated_fragments` consumes.
"""

from __future__ import annotations

import csv
import os

import jax
import numpy as np
from scipy.io import wavfile
from tqdm import tqdm

from ..signal.normalize import abs_max_normalise


def generate_dataset(model, variables, spec, dataset, output_dir: str, *,
                     per_item: int = 1, seed: int = 0,
                     sampler_kwargs: dict | None = None, batch_size: int = 8) -> str:
    """Sample ``per_item`` waveforms per dataset item; returns the manifest path.

    Unlike the reference (strictly sequential, one reverse-diffusion run per output:
    generate.py:22-47), (item, copy) tasks are batched through the scan sampler —
    every conditioning mel has the same static [n_mels, crop_frames] shape, so one
    compiled program serves the whole dataset and the MXU sees ``batch_size`` clips per
    reverse pass. The tail chunk is padded up to the static batch (extras discarded)
    rather than recompiling at a smaller shape. Heterogeneous mel shapes (not produced
    by GenerativeDataset, but allowed by the item contract) fall back to singles.
    """
    os.makedirs(output_dir, exist_ok=True)
    sampler_kwargs = sampler_kwargs or {}
    key = jax.random.key(seed)
    manifest_path = os.path.join(output_dir, "REFERENCE.csv")

    tasks = [(idx, copy) for idx in range(len(dataset)) for copy in range(per_item)]
    with open(manifest_path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["patient", "label", "file"])
        for start in tqdm(range(0, len(tasks), batch_size), desc="generating",
                          unit="batch"):
            chunk = tasks[start:start + batch_size]
            idxs = [i for i, _ in chunk]
            items = {i: dataset[i] for i in dict.fromkeys(idxs)}
            cons = [np.asarray(items[i]["con_spec"], np.float32) for i in idxs]
            if len({c.shape for c in cons}) > 1:        # heterogeneous: sample singly
                groups = [[task] for task in chunk]
            else:
                groups = [chunk]
            for group in groups:
                g_idxs = [i for i, _ in group]
                pad = (batch_size - len(group)) if group is chunk else 0
                con = np.stack([np.asarray(items[i]["con_spec"], np.float32)
                                for i in g_idxs] + [cons[0]] * pad)
                labels = np.asarray([int(items[i]["label"]) for i in g_idxs]
                                    + [0] * pad, np.int32)
                key, sub = jax.random.split(key)
                audio, sr = spec.sample(model, variables, con, labels, sub,
                                        **sampler_kwargs)
                audio = np.asarray(audio)
                for (idx, copy), wav in zip(group, audio):
                    wave = abs_max_normalise(wav).astype(np.float32)
                    item = items[idx]
                    name = f"{item['patient']}_{idx}_{copy}.wav"
                    wavfile.write(os.path.join(output_dir, name), sr, wave)
                    writer.writerow([item["patient"], item["label"], name])
    return manifest_path
