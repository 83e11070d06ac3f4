"""Attempt a jax.profiler trace of the train step on the TPU (tunnel support unknown)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fs, win = 16000, 64000
    batch = 96
    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs)
    model, variables = build_classifier(cfg, jax.random.key(0), win)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(batch, win)), jnp.float32)
    labels = jnp.asarray(np.arange(batch) % 2, jnp.int32)
    valid = jnp.ones((batch,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    if os.environ.get("W2VHS_AOT") != "0":
        trainer.aot_warm(waves, labels, valid)   # reuse the bench's cached executable
    state = trainer.state
    key = jax.random.key(1)

    def step(key):
        nonlocal state
        key, sub = jax.random.split(key)
        (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
            state.params, state.loss_params, state.opt_state, waves, labels, valid, lr, sub)
        return key, loss

    key, loss = step(key)
    print("warm loss", float(np.asarray(jax.device_get(loss))), flush=True)

    out = "/tmp/jaxtrace"
    os.makedirs(out, exist_ok=True)
    try:
        jax.profiler.start_trace(out)
        for _ in range(3):
            key, loss = step(key)
        float(np.asarray(jax.device_get(loss)))
        jax.profiler.stop_trace()
        print("trace ok", flush=True)
        for root, _, files in os.walk(out):
            for f in files:
                p = os.path.join(root, f)
                print(os.path.getsize(p), p, flush=True)
    except Exception as e:
        print("trace failed:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
