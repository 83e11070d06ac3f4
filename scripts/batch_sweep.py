"""Train-step throughput sweep over batch size (and remat) on the real chip.

Timing discipline: every step threads a fresh PRNG key and chains donated params, so the
runtime cannot cache or reorder steps; the final loss is fetched to force completion.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def sweep(batch: int, remat: bool, steps: int = 30):
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Config
    from wav2vec_heart_sounds_tpu.signal import jaxproc
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fs_in, fs = 2000, 16000
    win_len = 64000
    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs,
                           encoder=Wav2Vec2Config(remat=remat))
    model, variables = build_classifier(cfg, jax.random.key(0), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    rng = np.random.default_rng(0)
    t = np.arange(int(fs_in * 4.0)) / fs_in
    raw = (np.sin(2 * np.pi * 90 * t)[None]
           + 0.05 * rng.normal(size=(batch, t.size))).astype(np.float32)
    waves = jaxproc.preprocess_pcg(jnp.asarray(raw), fs_in, fs)[:, :win_len]
    waves = jax.block_until_ready(waves)
    labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
    valid = jnp.ones((batch,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    if os.environ.get("W2VHS_AOT") != "0":
        trainer.aot_warm(waves, labels, valid)
    state = trainer.state
    key = jax.random.key(1)

    def step(key):
        nonlocal state
        key, sub = jax.random.split(key)
        (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
            state.params, state.loss_params, state.opt_state, waves, labels, valid, lr, sub)
        return key, loss

    key, loss = step(key)            # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, loss = step(key)
    final = float(loss)              # forces the whole chain
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"batch": batch, "remat": remat, "train_step_ms": round(dt * 1e3, 2),
                      "windows_per_sec": round(batch / dt, 1), "final_loss": round(final, 4)}),
          flush=True)


if __name__ == "__main__":
    import sys
    configs = [(64, False), (128, False), (128, True), (256, True)]
    if len(sys.argv) > 1:
        configs = [(int(b), False) for b in sys.argv[1].split(",")]
    for batch, remat in configs:
        try:
            sweep(batch, remat)
        except Exception as e:  # OOM etc. — report and continue
            print(json.dumps({"batch": batch, "remat": remat,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)
