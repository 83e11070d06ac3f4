"""Generative stack tests: schedules, both vocoders, scan samplers, trainer, checkpointing.

Mirrors reference tests/test_generative.py:16-67 (finite loss, one real train step, sampler
output shape (B, hop*frames) at 4 kHz, checkpoint save/restore with step preserved, the
centred-STFT extra-frame regression) — on small configs so it runs on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.models.diffusion import (
    DiffWave,
    DiffWaveConfig,
    NoiseSchedule,
    WaveGrad,
    WaveGradConfig,
    align_fast_steps,
    diffwave_sample,
    wavegrad_sample,
)
from wav2vec_heart_sounds_tpu.train.generative import (
    GenBatcher,
    GenerativeTrainer,
    diffwave_loss,
    wavegrad_loss,
)

DW_CFG = DiffWaveConfig(residual_layers=4, residual_channels=8, n_mels=16, hop_length=64,
                        step_hidden=32)
WG_CFG = WaveGradConfig(n_mels=16, hop_length=300)
FRAMES = 4


def _dw_model_and_batch(batch=2):
    model = DiffWave(DW_CFG)
    T = DW_CFG.hop_length * FRAMES
    rng = np.random.default_rng(0)
    b = {
        "ref_audio": rng.normal(size=(batch, T)).astype(np.float32),
        "con_spec": rng.uniform(0, 1, size=(batch, DW_CFG.n_mels, FRAMES)).astype(np.float32),
        "label": np.asarray([0, 1][:batch], dtype=np.int32),
    }
    variables = model.init(jax.random.key(0), jnp.asarray(b["ref_audio"]),
                           jnp.zeros((batch,), jnp.int32), jnp.asarray(b["con_spec"]),
                           jnp.asarray(b["label"]))
    return model, variables, b


def _wg_model_and_batch(batch=2):
    model = WaveGrad(WG_CFG)
    T = WG_CFG.hop_length * FRAMES
    rng = np.random.default_rng(1)
    b = {
        "ref_audio": rng.normal(size=(batch, T)).astype(np.float32),
        "con_spec": rng.uniform(0, 1, size=(batch, WG_CFG.n_mels, FRAMES)).astype(np.float32),
        "label": np.asarray([0, 1][:batch], dtype=np.int32),
    }
    variables = model.init(jax.random.key(0), jnp.asarray(b["ref_audio"]),
                           jnp.asarray(b["con_spec"]), jnp.ones((batch,)),
                           jnp.asarray(b["label"]))
    return model, variables, b


def test_noise_schedule_terms():
    s = NoiseSchedule.linear(1e-4, 0.05, 50)
    assert len(s) == 50
    assert np.all(s.alphas < 1.0) and np.all(s.alphas > 0.9)
    assert s.alpha_cumprod[-1] < s.alpha_cumprod[0]
    cont = s.continuous_noise_levels()
    assert cont[0] == 1.0 and len(cont) == 51
    np.testing.assert_allclose(cont[1:], np.sqrt(s.alpha_cumprod))


def test_fast_step_alignment():
    cfg = DiffWaveConfig()
    mapped = align_fast_steps(cfg.training_schedule(),
                              NoiseSchedule(tuple(cfg.inference_betas)))
    assert len(mapped) == len(cfg.inference_betas)
    assert np.all(np.diff(mapped) > 0)          # monotone in noise level
    assert mapped.max() < len(cfg.training_schedule())


def test_diffwave_forward_and_loss():
    model, variables, b = _dw_model_and_batch()
    out = model.apply(variables, jnp.asarray(b["ref_audio"]), jnp.zeros((2,), jnp.int32),
                      jnp.asarray(b["con_spec"]), jnp.asarray(b["label"]))
    assert out.shape == b["ref_audio"].shape
    # zero-init output projection -> exactly zero prediction at init
    assert float(jnp.abs(out).max()) == 0.0
    loss = diffwave_loss(model, variables["params"],
                         {k: jnp.asarray(v) for k, v in b.items()}, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_diffwave_fractional_step_embedding():
    model, variables, b = _dw_model_and_batch()
    out = model.apply(variables, jnp.asarray(b["ref_audio"]),
                      jnp.asarray([0.5, 3.25], jnp.float32),
                      jnp.asarray(b["con_spec"]), jnp.asarray(b["label"]))
    assert out.shape == b["ref_audio"].shape


def test_wavegrad_forward_and_loss():
    model, variables, b = _wg_model_and_batch()
    out = model.apply(variables, jnp.asarray(b["ref_audio"]), jnp.asarray(b["con_spec"]),
                      jnp.ones((2,)), jnp.asarray(b["label"]))
    assert out.shape == b["ref_audio"].shape
    assert bool(jnp.isfinite(out).all())
    loss = wavegrad_loss(model, variables["params"],
                         {k: jnp.asarray(v) for k, v in b.items()}, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_wavegrad_extra_mel_frame_regression():
    """A centred-STFT conditioner with one extra frame must still run (truncated to T/hop)."""
    model, variables, b = _wg_model_and_batch()
    con = np.concatenate([b["con_spec"], b["con_spec"][:, :, :1]], axis=2)
    out = model.apply(variables, jnp.asarray(b["ref_audio"]), jnp.asarray(con),
                      jnp.ones((2,)), jnp.asarray(b["label"]))
    assert out.shape == b["ref_audio"].shape


def test_diffwave_sampler_shape_and_rate():
    model, variables, b = _dw_model_and_batch(batch=1)
    audio, sr = diffwave_sample(model, variables, b["con_spec"][0], 1,
                                jax.random.key(0), fast=True)
    assert sr == 4000
    assert audio.shape == (1, DW_CFG.hop_length * FRAMES)
    assert float(jnp.abs(audio).max()) <= 1.0


def test_wavegrad_sampler_subsampled_steps():
    model, variables, b = _wg_model_and_batch(batch=1)
    audio, sr = wavegrad_sample(model, variables, b["con_spec"][0], 0,
                                jax.random.key(0), num_steps=5)
    assert sr == 4000
    assert audio.shape == (1, WG_CFG.hop_length * FRAMES)
    assert float(jnp.abs(audio).max()) <= 1.0


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_generative_trainer_step_and_checkpoint(tmp_path):
    model, variables, b = _dw_model_and_batch()
    items = [{k: (v[i] if k != "label" else int(v[i])) for k, v in b.items()}
             | {"patient": f"p{i}"} for i in range(2)]
    ds = _ListDataset(items)
    trainer = GenerativeTrainer(model, variables, diffwave_loss, str(tmp_path),
                                lr=1e-3, log=lambda s: None)
    loader = GenBatcher(ds, batch_size=2, shuffle=True)
    trainer.train(loader, epochs=1)
    assert trainer.step >= 1
    assert (tmp_path / "weights.msgpack").exists()

    # restore roundtrip preserves step and params
    trainer2 = GenerativeTrainer(model, model.init(
        jax.random.key(9), jnp.asarray(b["ref_audio"]), jnp.zeros((2,), jnp.int32),
        jnp.asarray(b["con_spec"]), jnp.asarray(b["label"])), diffwave_loss,
        str(tmp_path), log=lambda s: None)
    assert trainer2.restore(str(tmp_path / "weights.msgpack"))
    assert trainer2.step == trainer.step
    a = jax.tree_util.tree_leaves(trainer.params)[0]
    c = jax.tree_util.tree_leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c))


def test_generate_dataset_writes_manifest(tmp_path):
    from wav2vec_heart_sounds_tpu.train.generate import generate_dataset
    import pandas as pd

    model, variables, b = _dw_model_and_batch()
    items = [{k: (v[i] if k != "label" else int(v[i])) for k, v in b.items()}
             | {"patient": f"p{i}"} for i in range(2)]
    ds = _ListDataset(items)

    class Spec:
        sample = staticmethod(lambda m, v, c, l, k, **kw: diffwave_sample(m, v, c, l, k, **kw))

    out = tmp_path / "gen"
    manifest = generate_dataset(model, variables, Spec, ds, str(out), per_item=1)
    df = pd.read_csv(manifest)
    assert len(df) == 2
    assert set(df.columns) == {"patient", "label", "file"}
    import os
    assert all(os.path.exists(out / f) for f in df["file"])


def test_generate_dataset_batched_tasks(tmp_path):
    """Batched sampling: (item, copy) tasks chunked at a static batch, pads discarded."""
    from wav2vec_heart_sounds_tpu.train.generate import generate_dataset
    import pandas as pd

    model, variables, b = _dw_model_and_batch()
    items = [{k: (v[i] if k != "label" else int(v[i])) for k, v in b.items()}
             | {"patient": f"p{i}"} for i in range(2)]
    ds = _ListDataset(items)
    seen_batches = []

    class Spec:
        @staticmethod
        def sample(m, v, c, l, k, **kw):
            seen_batches.append(np.asarray(c).shape[0])
            return diffwave_sample(m, v, c, l, k, **kw)

    out = tmp_path / "genb"
    manifest = generate_dataset(model, variables, Spec, ds, str(out), per_item=3,
                                batch_size=4)
    df = pd.read_csv(manifest)
    assert len(df) == 6                       # 2 items x 3 copies, pads discarded
    assert len(set(df["file"])) == 6
    import os
    assert all(os.path.exists(out / f) for f in df["file"])
    assert seen_batches == [4, 4]             # tail chunk padded to the static batch


def test_registry_specs():
    from wav2vec_heart_sounds_tpu.models.registry import get_spec
    for name, hop, mels in [("diffwave", 256, 80), ("wavegrad", 300, 128)]:
        spec = get_spec(name)
        assert spec.sample_rate == 4000 and spec.hop_length == hop
        assert spec.mel("pcg").f_max == 500.0
        assert spec.mel("ecg").f_max == 200.0
        assert spec.mel("pcg").n_mels == mels
    with pytest.raises(ValueError):
        get_spec("nope")
