"""Periodic generated-sample logging writes a WAV from the fixed conditioner batch."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec_heart_sounds_tpu.models.diffusion import DiffWave, DiffWaveConfig
from wav2vec_heart_sounds_tpu.models.diffusion.samplers import diffwave_sample
from wav2vec_heart_sounds_tpu.train.generative import (
    GenBatcher,
    GenerativeTrainer,
    diffwave_loss,
)

CFG = DiffWaveConfig(residual_layers=2, residual_channels=8, n_mels=8, hop_length=64,
                     step_hidden=16)


class _DS:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_sample_logging_writes_wav(tmp_path):
    model = DiffWave(CFG)
    T, F = CFG.hop_length * 2, 2
    rng = np.random.default_rng(0)
    items = [{"ref_audio": rng.normal(size=T).astype(np.float32),
              "con_spec": rng.uniform(0, 1, (CFG.n_mels, F)).astype(np.float32),
              "label": i % 2, "patient": f"p{i}"} for i in range(2)]
    variables = model.init(jax.random.key(0), jnp.zeros((1, T)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.asarray(items[0]["con_spec"])[None],
                           jnp.zeros((1,), jnp.int32))
    logdir = tmp_path / "logs"
    trainer = GenerativeTrainer(model, variables, diffwave_loss, str(tmp_path / "m"),
                                sampler=diffwave_sample, sample_every=1,
                                log_dir=str(logdir), log=lambda s: None)
    trainer.train(GenBatcher(_DS(items), 2, shuffle=False), epochs=1)
    wavs = [f for f in os.listdir(logdir) if f.endswith(".wav")]
    assert wavs, "expected a periodic generated-sample WAV"
    assert (logdir / "scalars.jsonl").exists()
