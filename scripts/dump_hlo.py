"""Dump the optimized HLO of the train step and map hot trace fusions to real ops."""

import re
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs)
    model, variables = build_classifier(cfg, jax.random.key(0), win)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    waves = jnp.zeros((batch, win), jnp.float32)
    labels = jnp.zeros((batch,), jnp.int32)
    valid = jnp.ones((batch,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.key(1)

    lowered = trainer._train_step.lower(trainer.state.params, trainer.state.loss_params,
                                        trainer.state.opt_state, waves, labels, valid,
                                        lr, key)
    compiled = lowered.compile()
    text = compiled.as_text()
    out = Path("/tmp/train_step_hlo.txt")
    out.write_text(text)
    print(f"wrote {out} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
