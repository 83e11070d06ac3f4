"""Observability + classifier on-disk checkpointing tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_heart_sounds_tpu.data import Batcher, Fragment, FragmentDataset
from wav2vec_heart_sounds_tpu.models import ClassifierConfig, Wav2Vec2Config, Wav2VecClassifier
from wav2vec_heart_sounds_tpu.train import SupervisedTrainer
from wav2vec_heart_sounds_tpu.utils import ScalarLogger, stopwatch

import pytest

pytestmark = pytest.mark.fast

def test_scalar_logger_jsonl(tmp_path):
    logger = ScalarLogger(str(tmp_path))
    logger.scalar("a/loss", 0.5, 1)
    logger.scalars("a", {"mcc": 0.7, "uar": 0.6}, 2)
    rows = [json.loads(l) for l in (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert len(rows) == 3
    assert rows[0]["tag"] == "a/loss" and rows[0]["value"] == 0.5
    assert {r["tag"] for r in rows[1:]} == {"a/mcc", "a/uar"}


def test_scalar_logger_noop_without_dir():
    ScalarLogger(None).scalar("x", 1.0, 0)  # must not raise


def test_stopwatch():
    sink = {}
    with stopwatch(sink, "t"):
        pass
    assert sink["t"] >= 0.0


def _tiny_trainer(tmp_path=None, **kw):
    cfg = ClassifierConfig(num_classes=2, head_hidden=(8,), fs=1000,
                           encoder=Wav2Vec2Config.tiny())
    model = Wav2VecClassifier(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((2, 500)))
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None, **kw)
    rng = np.random.default_rng(0)
    frags = [Fragment(rng.normal(size=500).astype(np.float32), i % 2, f"p{i}")
             for i in range(8)]
    return trainer, FragmentDataset(frags, fs=1000)


def test_trainer_writes_scalars(tmp_path):
    trainer, ds = _tiny_trainer(log_dir=str(tmp_path))
    trainer.fit(Batcher(ds, 4, True), Batcher(ds, 4, False), epochs=1)
    rows = [json.loads(l) for l in (tmp_path / "scalars.jsonl").read_text().splitlines()]
    tags = {r["tag"] for r in rows}
    assert "run/train_loss" in tags and "run/valid/mcc" in tags


def test_trainer_checkpoint_roundtrip(tmp_path):
    trainer, ds = _tiny_trainer()
    trainer.fit(Batcher(ds, 4, True), None, epochs=1)
    path = trainer.save(str(tmp_path / "clf.msgpack"))

    trainer2, _ = _tiny_trainer()
    assert trainer2.restore(path)
    assert trainer2.state.epoch == trainer.state.epoch
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not trainer2.restore(str(tmp_path / "missing.msgpack"))
