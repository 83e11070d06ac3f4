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
                     sampler_kwargs: dict | None = None) -> str:
    """Sample ``per_item`` waveforms per dataset item; returns the manifest path."""
    os.makedirs(output_dir, exist_ok=True)
    sampler_kwargs = sampler_kwargs or {}
    key = jax.random.key(seed)
    manifest_path = os.path.join(output_dir, "REFERENCE.csv")

    with open(manifest_path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["patient", "label", "file"])
        for idx in tqdm(range(len(dataset)), desc="generating", unit="item"):
            item = dataset[idx]
            for copy in range(per_item):
                key, sub = jax.random.split(key)
                audio, sr = spec.sample(model, variables, item["con_spec"],
                                        item["label"], sub, **sampler_kwargs)
                wave = abs_max_normalise(np.asarray(audio)[0]).astype(np.float32)
                name = f"{item['patient']}_{idx}_{copy}.wav"
                wavfile.write(os.path.join(output_dir, name), sr, wave)
                writer.writerow([item["patient"], item["label"], name])
    return manifest_path
