"""Batch sweep with encoder rematerialisation: find the post-remat throughput optimum.

Round-1 found a memory cliff at B>=112 without remat (PERF.md). Remat trades ~1/3 extra
encoder FLOPs for activation memory; if the cliff moves past B=128/160, the bigger batch may
beat the B=96 non-remat optimum. Run on an idle host: python scripts/remat_sweep.py
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np


def main(configs=((96, True), (128, True), (160, True), (192, True), (256, True))):
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Config
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fs, win, steps = 16000, 64000, 10
    for batch, remat in configs:
        try:
            cfg = ClassifierConfig(num_classes=2, num_channels=1,
                                   head_hidden=(512, 512, 512), random_init=True, fs=fs,
                                   encoder=Wav2Vec2Config(remat=remat))
            model, variables = build_classifier(cfg, jax.random.key(0), win)
            trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                        classifier_config=cfg, log=lambda s: None)
            rng = np.random.default_rng(0)
            waves = jnp.asarray(rng.normal(size=(batch, win)), jnp.float32)
            labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
            valid = jnp.ones((batch,), jnp.float32)
            lr = jnp.asarray(1e-3, jnp.float32)
            if os.environ.get("W2VHS_AOT") != "0":
                trainer.aot_warm(waves, labels, valid)  # serialized-executable cache
            state = trainer.state
            key = jax.random.key(1)

            def step(key):
                key, sub = jax.random.split(key)
                (state.params, state.loss_params, state.opt_state, loss, _) = \
                    trainer._train_step(state.params, state.loss_params, state.opt_state,
                                        waves, labels, valid, lr, sub)
                return key, loss

            key, loss = step(key)
            float(np.asarray(jax.device_get(loss)))              # force compile + first step
            t0 = time.perf_counter()
            for _ in range(steps):
                key, loss = step(key)
            float(np.asarray(jax.device_get(loss)))
            dt = time.perf_counter() - t0
            print(json.dumps({"batch": batch, "remat": remat,
                              "ms_per_step": round(1e3 * dt / steps, 1),
                              "windows_per_sec": round(batch * steps / dt, 1)}), flush=True)
        except Exception as e:                                    # OOM etc: report and move on
            print(json.dumps({"batch": batch, "remat": remat,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}), flush=True)


if __name__ == "__main__":
    main()
