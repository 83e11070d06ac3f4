"""The keystone correctness contract: NumPy oracle vs batched JAX twin.

Mirrors reference tests/test_torchaug.py:26-36 — every device-side primitive and the full
preprocessing chains must track the float64 oracle with corr > 0.999 and max-abs-diff < 5e-3,
evaluated in the float32 the TPU path actually runs in.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu import signal as sig
from wav2vec_heart_sounds_tpu.signal import jaxproc
from wav2vec_heart_sounds_tpu.signal.segment import WindowSpec

CORR = 0.999
MAXABS = 5e-3


def _assert_close(oracle: np.ndarray, device: np.ndarray):
    n = min(len(oracle), len(device))
    a, b = np.asarray(oracle)[:n], np.asarray(device)[:n]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > CORR, f"corr {corr}"
    assert np.max(np.abs(a - b)) < MAXABS, f"maxabs {np.max(np.abs(a - b))}"


def _mix(fs, seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    return (np.sin(2 * np.pi * 90 * t) + 0.5 * np.sin(2 * np.pi * 300 * t)
            + 0.05 * rng.normal(size=t.size))


def test_causal_cascade_matches_oracle():
    fs = 4125
    x = _mix(fs)
    oracle = sig.bandpass_cascade(x, fs, 25, 450, order=2)
    device = np.asarray(jaxproc.bandpass_cascade(jnp.asarray(x, jnp.float32), fs, 25, 450))
    _assert_close(oracle, device)


def test_causal_cascade_ecg_band_matches_oracle():
    # The 2/4125 normalised cutoff puts a pole very close to the unit circle — the stiffest
    # accumulation test for the float32 associative scan.
    fs = 4125
    x = _mix(fs, seconds=8.0, seed=1)
    oracle = sig.bandpass_cascade(x, fs, 2, 40, order=2)
    device = np.asarray(jaxproc.bandpass_cascade(jnp.asarray(x, jnp.float32), fs, 2, 40))
    _assert_close(oracle, device)


def test_associative_scan_matches_sequential_scan():
    from wav2vec_heart_sounds_tpu.ops import iir
    fs = 2000
    x = jnp.asarray(_mix(fs, 2.0), jnp.float32)[None, :]
    sos = iir.design_butter(450, fs, "lowpass", 2)
    par = np.asarray(iir.sosfilt(x, sos))
    seq = np.asarray(iir.sosfilt_sequential(x, sos))
    np.testing.assert_allclose(par, seq, atol=2e-5)


def test_resample_matches_scipy():
    for fs_in, fs_out, seed in [(2000, 4125, 0), (44100, 16000, 1), (4000, 4125, 2)]:
        x = _mix(fs_in, 2.0, seed)
        oracle = sig.resample(x, fs_in, fs_out)
        device = np.asarray(jaxproc.resample(jnp.asarray(x, jnp.float32)[None], fs_in, fs_out))[0]
        assert len(device) == len(oracle)
        _assert_close(oracle, device)


def test_despike_matches_oracle():
    fs = 1000
    x = _mix(fs, 4.0, 3)
    x[500] = 40.0
    x[2777] = -25.0
    oracle = sig.remove_spikes(x, fs)
    device = np.asarray(jaxproc.remove_spikes(jnp.asarray(x, jnp.float32)[None], fs))[0]
    _assert_close(oracle, device)


def test_despike_batched_rows_independent():
    fs = 1000
    clean = _mix(fs, 3.0, 4)
    spiky = clean.copy()
    spiky[1234] = 30.0
    batch = jnp.asarray(np.stack([clean, spiky]), jnp.float32)
    out = np.asarray(jaxproc.remove_spikes(batch, fs))
    _assert_close(sig.remove_spikes(clean, fs), out[0])
    _assert_close(sig.remove_spikes(spiky, fs), out[1])


def test_abs_max_normalise_matches_oracle():
    x = _mix(1000, 2.0, 5) * 7 + 3
    oracle = sig.abs_max_normalise(x)
    device = np.asarray(jaxproc.abs_max_normalise(jnp.asarray(x, jnp.float32)[None]))[0]
    _assert_close(oracle, device)


def test_preprocess_pcg_chain_matches_oracle():
    fs = 2000
    x = _mix(fs, 4.0, 6)
    oracle = sig.preprocess_pcg(x, fs, 4125)
    device = np.asarray(jaxproc.preprocess_pcg(jnp.asarray(x, jnp.float32)[None], fs, 4125))[0]
    _assert_close(oracle, device)


def test_preprocess_ecg_chain_matches_oracle():
    fs = 2000
    x = _mix(fs, 4.0, 7)
    oracle = sig.preprocess_ecg(x, fs, 4125)
    device = np.asarray(jaxproc.preprocess_ecg(jnp.asarray(x, jnp.float32)[None], fs, 4125))[0]
    _assert_close(oracle, device)


def test_preprocess_batch_shapes():
    x = jnp.asarray(np.stack([_mix(2000, 3.0, s) for s in range(4)]), jnp.float32)
    out = jaxproc.preprocess_pcg(x, 2000, 4125)
    assert out.shape[0] == 4 and bool(jnp.isfinite(out).all())
    windows = jaxproc.segment(out, 4125, WindowSpec(window_s=2.0))
    assert windows.ndim == 3 and windows.shape[0] == 4


def test_segment_matches_oracle():
    fs = 1000
    spec = WindowSpec(window_s=2.0)
    x = _mix(fs, 7.3, 8)
    oracle = sig.segment(x, fs, spec)
    device = np.asarray(jaxproc.segment(jnp.asarray(x, jnp.float32)[None], fs, spec))[0]
    assert device.shape == oracle.shape
    np.testing.assert_allclose(device, oracle, atol=1e-6)


def test_log_mel_matches_oracle():
    fs = 4000
    cfg = sig.MelConfig(sample_rate=fs, n_fft=1024, hop_length=256, n_mels=80, f_max=500)
    x = _mix(fs, 3.0, 9)
    oracle = sig.log_mel(x, cfg)
    device = np.asarray(jaxproc.log_mel(jnp.asarray(x, jnp.float32)[None], cfg))[0]
    assert device.shape == oracle.shape
    assert np.max(np.abs(oracle - device)) < MAXABS
