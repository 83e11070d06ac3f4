"""Decompose the train step with fetch-forced timing (block_until_ready is unreliable here).

Times, at B=64 / 4 s / 16 kHz, each with fresh per-step inputs and a value fetch:
  host->device transfer of the raw batch, forward-only, forward+grad, full train step.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(batch=64, steps=10):
    import jax
    import jax.numpy as jnp
    import optax

    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.signal import jaxproc
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer
    from wav2vec_heart_sounds_tpu.train.losses import cross_entropy

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    fs_in, fs = 2000, 16000
    win_len = 64000
    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs)
    model, variables = build_classifier(cfg, jax.random.key(0), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    rng = np.random.default_rng(0)
    t = np.arange(int(fs_in * 4.0)) / fs_in
    raw = (np.sin(2 * np.pi * 90 * t)[None]
           + 0.05 * rng.normal(size=(batch, t.size))).astype(np.float32)
    waves = jaxproc.preprocess_pcg(jnp.asarray(raw), fs_in, fs)[:, :win_len]
    fetch(waves)
    labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
    valid = jnp.ones((batch,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    out = {}

    # host -> device transfer of the raw batch (16 MB through the relay)
    t0 = time.perf_counter()
    for i in range(steps):
        raw[0, 0] = i                      # defeat any transfer caching
        dev = jax.device_put(raw)
        fetch(dev[0, :1])
    out["h2d_16MB_ms"] = round((time.perf_counter() - t0) / steps * 1e3, 1)

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    key = jax.random.key(1)

    def perturb(key):
        return waves * (1.0 + 1e-6 * jax.random.uniform(key, ()))

    logits = fwd(trainer.variables, waves)
    fetch(logits)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        logits = fwd(trainer.variables, perturb(sub))
    fetch(logits)
    out["forward_ms"] = round((time.perf_counter() - t0) / steps * 1e3, 1)

    grad_fn = jax.jit(lambda v, x: jax.value_and_grad(
        lambda p: cross_entropy(model.apply({"params": p}, x), labels, valid)
    )(v["params"]))
    loss, grads = grad_fn(trainer.variables, waves)
    fetch(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        loss, grads = grad_fn(trainer.variables, perturb(sub))
    fetch(loss)
    out["forward_backward_ms"] = round((time.perf_counter() - t0) / steps * 1e3, 1)

    state = trainer.state
    def step(key):
        nonlocal state
        key, sub = jax.random.split(key)
        (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
            state.params, state.loss_params, state.opt_state, waves, labels, valid, lr, sub)
        return key, loss

    key, loss = step(key)
    fetch(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, loss = step(key)
    fetch(loss)
    out["train_step_ms"] = round((time.perf_counter() - t0) / steps * 1e3, 1)
    out["batch"] = batch
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
