"""Realistic training-loop throughput on the chip: Batcher -> transfers -> jitted steps.

Unlike bench.py (device-resident batch), this pays the real host->device transfer per step
and exercises the int16 wire format, measuring windows/sec as a user-facing epoch would see.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run(wire_int16: bool, batch=96, n_windows=288, epochs=2):
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.data import Batcher, Fragment, FragmentDataset
    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fs = 16000
    win = 64000
    rng = np.random.default_rng(0)
    frags = [Fragment((0.5 * np.sin(2 * np.pi * (60 + 30 * (i % 2)) *
                                    np.arange(win) / fs)
                       + 0.05 * rng.normal(size=win)).astype(np.float32),
                      i % 2, f"p{i % 16}") for i in range(n_windows)]
    ds = FragmentDataset(frags, fs=fs)

    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs)
    model, variables = build_classifier(cfg, jax.random.key(0), win)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    batcher = Batcher(ds, batch_size=batch, train=True, seed=0, target_len=win,
                      wire_int16=wire_int16)

    trainer._run_epoch(batcher, True, max_batches=1)     # compile
    t0 = time.perf_counter()
    n_steps = 0
    for _ in range(epochs):
        cm, _ = trainer._run_epoch(batcher, True, max_batches=None)
        n_steps += len(batcher)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "wire_int16": wire_int16,
        "windows_per_sec_real_loop": round(batch * n_steps / dt, 1),
        "step_ms": round(dt / n_steps * 1e3, 1),
        "steps": n_steps,
    }), flush=True)


if __name__ == "__main__":
    run(True)
    run(False)
