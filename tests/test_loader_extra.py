"""Loader edge cases: tiny datasets, prefetch, window_starts boundaries."""

import numpy as np
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
