"""Native C++ preprocessing vs the NumPy oracle: exact-agreement contract (~1e-10)."""

import numpy as np
import pytest

from wav2vec_heart_sounds_tpu import native
from wav2vec_heart_sounds_tpu import signal as sig

pytestmark = [pytest.mark.fast,
              pytest.mark.skipif(not native.available(),
                                 reason="native library unavailable (no g++?)")]


def _mix(fs, seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    return (np.sin(2 * np.pi * 90 * t) + 0.5 * np.sin(2 * np.pi * 300 * t)
            + 0.05 * rng.normal(size=t.size))


def test_native_resample_matches_scipy():
    for fs_in, fs_out in [(2000, 4125), (2000, 16000), (44100, 16000)]:
        x = _mix(fs_in, 2.0)
        oracle = sig.resample(x, fs_in, fs_out)
        fast = native.resample(x, fs_in, fs_out)
        assert len(fast) == len(oracle)
        np.testing.assert_allclose(fast, oracle, atol=1e-10)


def test_native_despike_matches_oracle():
    fs = 1000
    x = _mix(fs, 4.0, 1)
    x[500] = 40.0
    x[2777] = -25.0
    np.testing.assert_allclose(native.remove_spikes(x, fs), sig.remove_spikes(x, fs),
                               atol=1e-12)


def test_native_pcg_chain_matches_oracle():
    x = _mix(2000, 4.0, 2)
    x[100] = np.nan  # NaN-interpolation included in the contract
    np.testing.assert_allclose(native.preprocess_pcg(x, 2000, 4125),
                               sig.preprocess_pcg(x, 2000, 4125), atol=1e-9)


def test_native_ecg_chain_matches_oracle():
    x = _mix(2000, 4.0, 3)
    np.testing.assert_allclose(native.preprocess_ecg(x, 2000, 4125),
                               sig.preprocess_ecg(x, 2000, 4125), atol=1e-9)


def test_native_batch_matches_single():
    batch = np.stack([_mix(2000, 3.0, s) for s in range(4)])
    out = native.preprocess_pcg_batch(batch, 2000, 4125)
    for i in range(4):
        np.testing.assert_allclose(out[i], native.preprocess_pcg(batch[i], 2000, 4125),
                                   atol=1e-12)
        np.testing.assert_allclose(out[i], sig.preprocess_pcg(batch[i], 2000, 4125),
                                   atol=1e-9)
