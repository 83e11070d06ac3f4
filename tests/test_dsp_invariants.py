"""Property/invariant tests for the in-house DSP (augment/dsp.py).

The upstream libraries the reference used (librosa HPSS, pyrubberband stretch —
reference src/mpcg_wav2vec/augment/primitives.py:88-123) are absent in this environment, so
the self-goldens in tests/test_augment.py cannot catch a *semantic* divergence from them.
These tests pin the mathematical invariants any correct implementation must satisfy,
independent of golden values (round-4 verdict item 8):

* STFT -> ISTFT perfect reconstruction across the exact (n_fft, hop) grid the augmentation
  pipelines sample (augment/primitives.py:126-133);
* HPSS mask complementarity at margin 1.0, decomposition additivity (h + p + r == x in the
  STFT domain by construction, checked through the round trip), mask boundedness, and margin
  monotonicity (raising a margin never increases that component's mask);
* phase-vocoder length contract, keep_length contract, energy sanity on a stationary tone,
  and rate=1.0 pass-through.
"""

import numpy as np
import pytest

from wav2vec_heart_sounds_tpu.augment import dsp


def _tone_mix(n: int, fs: int = 4000, seed: int = 0) -> np.ndarray:
    """Harmonic tone + click train + noise floor — has all three HPSS components."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = 0.6 * np.sin(2 * np.pi * 55 * t) + 0.3 * np.sin(2 * np.pi * 110 * t)
    clicks = np.zeros(n)
    clicks[::500] = 1.0
    x = x + 0.4 * clicks + 0.02 * rng.normal(size=n)
    return x


# --- STFT / ISTFT -------------------------------------------------------------------------

@pytest.mark.fast
@pytest.mark.parametrize("n_fft", [512, 1024, 2048])
@pytest.mark.parametrize("hop", [16, 32, 64, 128])
def test_stft_istft_perfect_reconstruction_pipeline_grid(n_fft, hop):
    """COLA round trip <= 1e-6 max-abs over the exact grid hpss_recombine samples."""
    x = _tone_mix(6000)
    y = dsp.istft(dsp.stft(x, n_fft, hop), n_fft, hop, length=len(x))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-6)


@pytest.mark.fast
def test_stft_istft_reconstruction_stretch_config():
    """The phase vocoder's own config (n_fft 2048, hop n_fft//4) round-trips too."""
    x = _tone_mix(10000, seed=3)
    y = dsp.istft(dsp.stft(x, 2048, 512), 2048, 512, length=len(x))
    np.testing.assert_allclose(y, x, atol=1e-6)


@pytest.mark.fast
def test_stft_linearity():
    """STFT must be linear — masks split energy, they cannot create it."""
    a, b = _tone_mix(4096, seed=1), _tone_mix(4096, seed=2)
    Sa, Sb, Sab = (dsp.stft(s, 1024, 64) for s in (a, b, a + 2.0 * b))
    np.testing.assert_allclose(Sab, Sa + 2.0 * Sb, atol=1e-8)


# --- HPSS ---------------------------------------------------------------------------------

@pytest.mark.fast
def test_hpss_masks_complementary_at_unit_margin():
    """At margin (1, 1) the soft masks sum to exactly 1 everywhere (librosa semantics:
    the Driedger soft mask with shared references partitions every bin)."""
    S = np.abs(dsp.stft(_tone_mix(6000), 1024, 64))
    mh, mp = dsp.hpss_masks(S, kernel_size=(17, 17), margin=(1.0, 1.0))
    np.testing.assert_allclose(mh + mp, np.ones_like(mh), atol=1e-10)
    assert float(mh.min()) >= 0.0 and float(mh.max()) <= 1.0
    assert float(mp.min()) >= 0.0 and float(mp.max()) <= 1.0


@pytest.mark.fast
@pytest.mark.parametrize("kernel", [(9, 9), (31, 31)])
def test_hpss_margin_monotonicity(kernel):
    """Raising a component's margin must never increase that component's mask, and the
    discarded mass lands in the residual (masks stay in [0, 1])."""
    S = np.abs(dsp.stft(_tone_mix(6000), 1024, 64))
    prev_h = prev_p = None
    for m in (1.0, 1.5, 2.0, 4.0):
        mh, mp = dsp.hpss_masks(S, kernel_size=kernel, margin=(m, m))
        assert float(mh.min()) >= 0.0 and float(mh.max()) <= 1.0
        assert float(mp.min()) >= 0.0 and float(mp.max()) <= 1.0
        if prev_h is not None:
            assert np.all(mh <= prev_h + 1e-12)
            assert np.all(mp <= prev_p + 1e-12)
        prev_h, prev_p = mh, mp


@pytest.mark.fast
def test_hpss_split_additivity():
    """harmonic + percussive + residual must reconstruct the input exactly (the residual
    is defined as S - (H + P), so the only error budget is the ISTFT round trip)."""
    x = _tone_mix(6000)
    h, p, r = dsp.hpss_split(x, 1024, 64, margin=(1.3, 2.1), kernel=(15, 21))
    assert h.shape == p.shape == r.shape == x.shape
    np.testing.assert_allclose(h + p + r, x, atol=1e-6)


@pytest.mark.fast
def test_hpss_separates_tone_from_clicks():
    """Semantic sanity: a pure tone goes (mostly) harmonic, a click train percussive."""
    fs, n = 4000, 8000
    t = np.arange(n) / fs
    tone = np.sin(2 * np.pi * 80 * t)
    clicks = np.zeros(n)
    clicks[::400] = 1.0
    h, p, _ = dsp.hpss_split(tone + clicks, 1024, 64, margin=(1.0, 1.0), kernel=(31, 31))
    # Harmonic channel correlates with the tone; percussive with the clicks (the click
    # train's correlation ceiling is well below 1: each impulse smears over the synthesis
    # window, so 0.34 against the ideal unit-impulse train is the separated regime —
    # the cross terms below carry the ordering semantics).
    corr_ht = np.corrcoef(h, tone)[0, 1]
    corr_pc = np.corrcoef(p, clicks)[0, 1]
    assert corr_ht > 0.9, corr_ht
    assert corr_pc > 0.25, corr_pc
    assert np.corrcoef(h, clicks)[0, 1] < 0.5 * corr_pc
    assert np.corrcoef(p, tone)[0, 1] < 0.5 * corr_ht
    # Energy check, window-smear independent: percussive energy concentrates around the
    # click instants (±32 samples), harmonic energy does not.
    mask = np.zeros(n, dtype=bool)
    for c in range(0, n, 400):
        mask[max(0, c - 32): c + 32] = True
    p_conc = np.mean(p[mask] ** 2) / max(np.mean(p ** 2), 1e-12)
    h_conc = np.mean(h[mask] ** 2) / max(np.mean(h ** 2), 1e-12)
    # ±32 samples catches the click cores only (the 1024-sample synthesis window smears
    # the rest), so ~2x concentration vs the harmonic channel's ~uniform 0.9 is the
    # separated regime.
    assert p_conc > 1.5, (p_conc, h_conc)
    assert p_conc > 2.0 * h_conc, (p_conc, h_conc)


# --- phase vocoder ------------------------------------------------------------------------

@pytest.mark.fast
@pytest.mark.parametrize("rate", [0.7, 0.8, 1.004, 1.2, 1.3])
def test_time_stretch_length_contract(rate):
    """Output length must be round(len(x)/rate) (librosa convention, rate>1 shortens)."""
    x = _tone_mix(8000)
    y = dsp.time_stretch(x, 4000, rate)
    assert len(y) == int(round(len(x) / rate))


@pytest.mark.fast
@pytest.mark.parametrize("rate", [0.7, 1.3])
def test_time_stretch_keep_length_contract(rate):
    """keep_length crops to at most the input length; slow rates keep it exactly."""
    x = _tone_mix(8000)
    y = dsp.time_stretch(x, 4000, rate, keep_length=True)
    if rate < 1.0:
        assert len(y) == len(x)          # stretched longer, cropped back
    else:
        assert len(y) == int(round(len(x) / rate))  # shorter stays shorter


@pytest.mark.fast
def test_time_stretch_identity_rate():
    x = _tone_mix(4000)
    np.testing.assert_allclose(dsp.time_stretch(x, 4000, 1.0), x, atol=0.0)


@pytest.mark.fast
@pytest.mark.parametrize("rate", [0.8, 1.25])
def test_time_stretch_preserves_tone_energy_and_pitch(rate):
    """On a stationary tone the vocoder must preserve RMS (within 10%) and the dominant
    frequency (pitch unchanged — that is the whole point of a phase vocoder)."""
    fs, n = 4000, 16000
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 100 * t)
    y = dsp.time_stretch(x, fs, rate)
    # Trim edges (windowing taper) before the RMS comparison.
    yc, xc = y[1024:-1024], x[1024:-1024]
    assert abs(np.sqrt(np.mean(yc ** 2)) / np.sqrt(np.mean(xc ** 2)) - 1.0) < 0.1
    freqs = np.fft.rfftfreq(len(yc), 1.0 / fs)
    peak = freqs[int(np.argmax(np.abs(np.fft.rfft(yc * np.hanning(len(yc))))))]
    assert abs(peak - 100.0) < 2.0, peak
