"""Oracle (NumPy) signal-processing properties.

Mirrors the reference's unit-numerics strategy (reference tests/test_signalproc.py:13-66):
property-style assertions on synthetic tones.
"""

import numpy as np

from wav2vec_heart_sounds_tpu import signal as sig
from wav2vec_heart_sounds_tpu.config import default_window

import pytest

pytestmark = pytest.mark.fast

def tone(freq, fs, seconds=3.0):
    t = np.arange(int(fs * seconds)) / fs
    return np.sin(2 * np.pi * freq * t)


def test_zero_phase_bandpass_attenuates_out_of_band():
    fs = 1000
    assert np.mean(sig.butter_bandpass(tone(100, fs), fs, 25, 450) ** 2) > 0.3
    assert np.mean(sig.butter_bandpass(tone(5, fs), fs, 25, 450) ** 2) < 0.05
    assert np.mean(sig.butter_bandpass(tone(480, fs), fs, 25, 450) ** 2) < 0.05


def test_despike_removes_injected_spike():
    fs = 1000
    x = tone(40, fs).copy()
    x[1500] = 50.0
    assert np.max(np.abs(sig.remove_spikes(x, fs))) < 5.0


def test_despike_noop_on_clean_signal():
    fs = 1000
    x = tone(40, fs)
    np.testing.assert_allclose(sig.remove_spikes(x, fs), x)


def test_resample_length_and_tone_preserved():
    x = tone(50, 2000, seconds=3.0)
    y = sig.resample(x, 2000, 4125)
    assert abs(len(y) - round(len(x) * 4125 / 2000)) <= 1
    # the 50 Hz tone survives resampling with near-unit amplitude
    assert 0.4 < np.mean(y ** 2) < 0.6


def test_normaliser_ranges():
    rng = np.random.default_rng(0)
    x = rng.normal(2, 3, 5000)
    assert np.isclose(sig.minmax_normalise(x).min(), -1.0)
    assert np.isclose(sig.minmax_normalise(x).max(), 1.0)
    assert np.max(np.abs(sig.abs_max_normalise(x))) <= 1.0 + 1e-6
    kp = sig.kpeak_normalise(x, k=3)
    assert kp.min() >= -1.5 and kp.max() <= 1.5


def test_interpolate_nans():
    x = np.array([0.0, np.nan, 2.0, np.nan, np.nan, 5.0])
    np.testing.assert_allclose(sig.interpolate_nans(x), [0, 1, 2, 3, 4, 5])


def test_preprocess_pcg_finite_and_bounded():
    fs = 2000
    x = tone(90, fs) + 0.5 * tone(600, fs)
    out = sig.preprocess_pcg(x, fs, 4125)
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out)) <= 1.0 + 1e-6


def test_segmentation_counts_and_lengths():
    fs = 1000
    spec = default_window("vest")
    windows = sig.segment(tone(40, fs, seconds=10.0), fs, spec)
    assert windows.shape[1] == spec.window_len(fs) == 2000
    assert windows.shape[0] >= 4
    # multichannel keeps the channel axis
    x2 = np.stack([tone(40, fs, 5.0), tone(60, fs, 5.0)], axis=1)
    w2 = sig.segment(x2, fs, spec)
    assert w2.ndim == 3 and w2.shape[1:] == (2000, 2)
    # too-short signal -> empty but correctly shaped
    assert sig.segment(tone(40, fs, 0.1), fs, spec).shape == (0, 2000)


def test_log_mel_oracle_range():
    fs = 4000
    cfg = sig.MelConfig(sample_rate=fs, n_fft=1024, hop_length=256, n_mels=80, f_max=500)
    mel = sig.log_mel(tone(100, fs), cfg)
    assert mel.min() >= 0.0 and mel.max() <= 1.0
    assert mel.shape[0] == 80


def test_mel_filterbank_matches_torchaudio_semantics():
    """Pin the HTK triangle construction against torchaudio when available."""
    try:
        from torchaudio.functional import melscale_fbanks
        import torch
    except ImportError:
        import pytest
        pytest.skip("torchaudio not installed")
    ours = sig.mel_filterbank(513, 0.125, 500.0, 80, 4000)
    theirs = melscale_fbanks(513, 0.125, 500.0, 80, 4000).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_envelopes():
    fs = 1000
    x = tone(50, fs)
    env = sig.hilbert_envelope(x)
    assert np.allclose(env[100:-100], 1.0, atol=0.05)
    hom = sig.homomorphic_envelope(x, fs)
    assert np.all(hom > 0)


def test_four_band_decomposition_shapes():
    fs = 1000
    out = sig.preprocess_four_bands(tone(100, fs), fs)
    assert out.shape == (len(tone(100, fs)), 4)
