"""Loader edge cases: tiny datasets, prefetch, window_starts boundaries."""

import numpy as np
import pytest
import jax

from wav2vec_heart_sounds_tpu.data import Batcher, Fragment, FragmentDataset, prefetch_to_device
from wav2vec_heart_sounds_tpu.signal import WindowSpec, window_starts



def _tiny_ds(n=3, t=100):
    rng = np.random.default_rng(0)
    return FragmentDataset(
        [Fragment(rng.normal(size=t).astype(np.float32), i % 2, f"p{i}") for i in range(n)],
        fs=100)


def test_train_batcher_smaller_than_batch_yields_one_full_batch():
    b = Batcher(_tiny_ds(3), batch_size=8, train=True, seed=0)
    batches = list(b)
    assert len(batches) == 1
    assert batches[0]["waveform"].shape == (8, 100)
    assert batches[0]["valid"].all()


def test_prefetch_to_device_preserves_order_and_content():
    b = Batcher(_tiny_ds(8), batch_size=2, train=False)
    plain = list(b)
    fetched = list(prefetch_to_device(Batcher(_tiny_ds(8), batch_size=2, train=False)))
    assert len(fetched) == len(plain)
    for p, f in zip(plain, fetched):
        np.testing.assert_allclose(np.asarray(f["waveform"]), p["waveform"])
        assert f["patient"] == p["patient"]


def test_window_starts_boundaries():
    spec = WindowSpec(window_s=2.0)
    fs = 100
    assert window_starts(10, fs, spec) == []                 # ends inside start pad
    starts = window_starts(1000, fs, spec)                   # 10 s signal
    assert starts[0] == 30
    assert all(b - a == spec.hop_len(fs) for a, b in zip(starts, starts[1:]))
    # exactly one window when signal barely exceeds the pad
    assert window_starts(50, fs, spec) == [30]


def test_int16_wire_format_roundtrip():
    """Quantised wire batches dequantise within the numerical contract and train fine."""
    import jax.numpy as jnp
    from wav2vec_heart_sounds_tpu.data.loader import WIRE_SCALE
    from wav2vec_heart_sounds_tpu.models import (ClassifierConfig, Wav2Vec2Config,
                                                 Wav2VecClassifier)
    from wav2vec_heart_sounds_tpu.train import SupervisedTrainer

    ds = _tiny_ds(8, t=500)
    b16 = next(iter(Batcher(ds, 4, False, wire_int16=True)))
    b32 = next(iter(Batcher(ds, 4, False)))
    assert b16["waveform"].dtype == np.int16
    deq = b16["waveform"].astype(np.float32) / WIRE_SCALE
    # items are unit-normalised-ish noise; quantisation error bounded by 1/32767
    assert np.max(np.abs(deq - np.clip(b32["waveform"], -1, 1))) < 1.5 / WIRE_SCALE

    cfg = ClassifierConfig(num_classes=2, head_hidden=(8,), fs=100,
                           encoder=Wav2Vec2Config.tiny())
    model = Wav2VecClassifier(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((2, 500)))
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)
    best = trainer.fit(Batcher(ds, 4, True, wire_int16=True),
                       Batcher(ds, 4, False, wire_int16=True), epochs=1)
    assert np.isfinite(best)


def test_prefetch_threaded_worker_stops_on_abandon():
    """Abandoning the generator early (max_batches break) must release the worker thread
    rather than leave it blocked forever on the bounded queue (review finding)."""
    import threading
    import time

    from wav2vec_heart_sounds_tpu.data.loader import prefetch_threaded

    released = threading.Event()

    def items():
        try:
            for i in range(100):
                yield i
        finally:
            released.set()

    before = threading.active_count()
    gen = prefetch_threaded(items())
    assert next(gen) == 0
    gen.close()                      # consumer abandons mid-epoch
    assert released.wait(timeout=5.0), "worker thread never exited the source iterator"
    for _ in range(50):              # thread count settles back
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before
