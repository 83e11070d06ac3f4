"""Dataset layer tests: fixture-driven loaders, splits, schedule, batching.

Mirrors the reference's tmp_path fixture strategy (reference tests/test_vest_loader.py,
test_generated.py, test_heart_cycles.py, test_datasets_and_schedule.py,
test_splits_and_reporting.py) on the framework's own loaders and WFDB reader.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from wav2vec_heart_sounds_tpu import data as D
from wav2vec_heart_sounds_tpu.data import wfdb_io

pytestmark = pytest.mark.fast
from wav2vec_heart_sounds_tpu.signal import WindowSpec


def tone(freq, fs, seconds=3.0):
    t = np.arange(int(fs * seconds)) / fs
    return np.sin(2 * np.pi * freq * t)


# --- wfdb_io ---------------------------------------------------------------

def test_wfdb_roundtrip(tmp_path):
    fs = 1000
    sig = np.stack([tone(50, fs), tone(7, fs)], axis=1)
    wfdb_io.write_record(str(tmp_path / "a0001"), sig, fs, sig_names=["PCG", "ECG"])
    rec = wfdb_io.read_record(str(tmp_path / "a0001"))
    assert rec.fs == fs and rec.sig_name == ["PCG", "ECG"]
    assert rec.p_signal.shape == sig.shape
    np.testing.assert_allclose(rec.p_signal, sig, atol=1e-3)


def test_wfdb_partial_read(tmp_path):
    fs = 500
    wfdb_io.write_record(str(tmp_path / "r"), tone(20, fs), fs)
    rec = wfdb_io.read_record(str(tmp_path / "r"), sampfrom=100, sampto=300)
    assert rec.p_signal.shape[0] == 200
    full = wfdb_io.read_record(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal, full.p_signal[100:300])


def test_wfdb_format212(tmp_path):
    # hand-roll a 212 file: two signals, 4 samples each
    vals = np.array([[100, -200], [300, -400], [511, 512], [-2048, 2047]], dtype=np.int32)
    flat = vals.reshape(-1)
    raw = bytearray()
    for i in range(0, len(flat), 2):
        s0, s1 = int(flat[i]) & 0xFFF, int(flat[i + 1]) & 0xFFF
        raw += bytes([s0 & 0xFF, ((s0 >> 8) & 0x0F) | ((s1 >> 4) & 0xF0), s1 & 0xFF])
    (tmp_path / "x.dat").write_bytes(bytes(raw))
    (tmp_path / "x.hea").write_text(
        "x 2 360 4\nx.dat 212 200(0)/mV 12 0 0 0 0 A\nx.dat 212 200(0)/mV 12 0 0 0 0 B\n")
    rec = wfdb_io.read_record(str(tmp_path / "x"))
    expected = vals.astype(np.float64) / 200.0
    expected[3, 0] = np.nan  # -2048 is the format-212 invalid sentinel
    np.testing.assert_allclose(rec.p_signal[:3], expected[:3])
    assert np.isnan(rec.p_signal[3, 0]) and rec.p_signal[3, 1] == pytest.approx(2047 / 200)


# --- splits ----------------------------------------------------------------

def _write_reference(d, labels):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "REFERENCE.csv"), "w") as fh:
        for rec, lab in labels.items():
            fh.write(f"{rec},{lab}\n")


def test_splits_deterministic_and_stratified(tmp_path):
    labels = {f"a{i:04d}": (1 if i % 3 == 0 else -1) for i in range(60)}
    _write_reference(tmp_path / "db", labels)
    df1 = D.make_splits_from_dirs([str(tmp_path / "db")], folds=2, seed=7)
    df2 = D.make_splits_from_dirs([str(tmp_path / "db")], folds=2, seed=7)
    pd.testing.assert_frame_equal(df1, df2)
    assert set(df1.columns) == {"patient", "label", "split", "split2"}
    for col in ("split", "split2"):
        counts = df1[col].value_counts()
        assert counts["train"] > counts["valid"] >= 1 and counts["test"] >= 1
    # different folds differ
    assert (df1["split"] != df1["split2"]).any()
    out = D.write_splits(df1, tmp_path / "out" / "splits.csv")
    assert os.path.exists(out)


# --- fragments + batching ----------------------------------------------------

def _fragments(n0=6, n1=2, t=500):
    rng = np.random.default_rng(0)
    frags = []
    for i in range(n0):
        frags.append(D.Fragment(rng.normal(size=t).astype(np.float32), 0, f"p{i}"))
    for i in range(n1):
        frags.append(D.Fragment(rng.normal(size=t).astype(np.float32), 1, f"q{i}"))
    return frags


def test_fragment_dataset_balanced_expansion():
    calls = []

    def aug(w, fs):
        calls.append(1)
        return w * 0.5

    ds = D.FragmentDataset(_fragments(), fs=1000, augment_num=2, augment_fn=aug)
    # minority class (2 items) gets round(2 * 6/2) = 6 copies each; majority 2 copies each
    assert len(ds) == 8 + 6 * 2 + 2 * 6
    labels = np.asarray(ds.labels)
    assert (labels == 1).sum() == 2 + 2 * 6
    aug_idx = int(np.flatnonzero(ds.is_augmented)[0])
    _ = ds[aug_idx]
    assert len(calls) == 1


def test_fragment_dataset_cache_calls_once():
    calls = []

    def aug(w, fs):
        calls.append(1)
        return w

    ds = D.FragmentDataset(_fragments(2, 2), fs=1000, augment_num=1, augment_fn=aug,
                           cache_augmented=True)
    idx = int(np.flatnonzero(ds.is_augmented)[0])
    _ = ds[idx]
    _ = ds[idx]
    assert len(calls) == 1


def test_batcher_static_shapes_and_balance():
    ds = D.FragmentDataset(_fragments(12, 4), fs=1000)
    b = D.Batcher(ds, batch_size=4, train=True, seed=0)
    batches = list(b)
    assert len(batches) == len(ds) // 4
    for batch in batches:
        assert batch["waveform"].shape == (4, 500)
        assert batch["label"].shape == (4,)
    # balanced bootstrap: class 1 should appear far more than its 25% share
    all_labels = np.concatenate([b["label"] for b in batches])
    assert 0.3 < (all_labels == 1).mean() < 0.7


def test_batcher_eval_tail_marked_invalid():
    ds = D.FragmentDataset(_fragments(3, 2), fs=1000)   # 5 items
    b = D.Batcher(ds, batch_size=4, train=False)
    batches = list(b)
    assert len(batches) == 2
    assert batches[0]["valid"].all()
    assert batches[1]["valid"].sum() == 1


def test_pad_batch_multichannel():
    waves = [np.ones((100, 3), np.float32), np.ones((80, 3), np.float32)]
    out = D.pad_batch(waves)
    assert out.shape == (2, 100, 3)
    assert out[1, 80:].sum() == 0


# --- cinc loader -------------------------------------------------------------

@pytest.fixture
def cinc_dir(tmp_path):
    fs = 2000
    d = tmp_path / "cinc"
    d.mkdir()
    rows = []
    for i, lab in enumerate([1, -1, 1, -1]):
        pcg = tone(90, fs, 6.0) + 0.1 * np.random.default_rng(i).normal(size=int(fs * 6.0))
        ecg = tone(9, fs, 6.0)
        wfdb_io.write_record(str(d / f"a{i:04d}"), np.stack([pcg, ecg], axis=1), fs,
                             sig_names=["PCG", "ECG"])
        rows.append({"patient": f"a{i:04d}", "abnormality": lab,
                     "split": "train" if i < 2 else "valid"})
    pd.DataFrame(rows).to_csv(d / "split.csv", index=False)
    return d


def test_cinc_build_fragments(cinc_dir):
    window = WindowSpec(window_s=2.0)
    frags = D.build_fragments(str(cinc_dir), str(cinc_dir / "split.csv"), "train",
                              fs_out=4125, window=window)
    assert len(frags) > 0
    assert all(f.waveform.shape == (window.window_len(4125),) for f in frags)
    assert {f.label for f in frags} == {0, 1}
    # PCG+ECG stacking
    frags2 = D.build_fragments(str(cinc_dir), str(cinc_dir / "split.csv"), "train",
                               fs_out=4125, window=window, ecg=True)
    assert frags2[0].waveform.shape == (window.window_len(4125), 2)
    # missing records silently skipped
    frags3 = D.build_fragments(str(cinc_dir), str(cinc_dir / "split.csv"), "valid",
                               fs_out=4125, window=window)
    assert len(frags3) > 0


def test_cinc_augmented_copies(cinc_dir):
    window = WindowSpec(window_s=2.0)
    from wav2vec_heart_sounds_tpu.augment import AugmentConfig
    cfg = AugmentConfig(prob_hpss=0.0, prob_real_noise=0.0, prob_time_warp=0.0)
    plain = D.build_fragments(str(cinc_dir), str(cinc_dir / "split.csv"), "train",
                              fs_out=4125, window=window)
    aug = D.build_fragments(str(cinc_dir), str(cinc_dir / "split.csv"), "train",
                            fs_out=4125, window=window, augment_num=1, augment_config=cfg,
                            rng=np.random.default_rng(0))
    assert len(aug) > len(plain)
    assert any("#aug" in f.patient for f in aug)


# --- vest loader --------------------------------------------------------------

def test_vest_loader(tmp_path):
    fs = 4000
    d = tmp_path / "vest"
    d.mkdir()
    sig = np.stack([tone(80 + 10 * c, fs, 5.0) for c in range(9)], axis=1)
    wavfile.write(str(d / "patient01_rec.wav"), fs, (sig * 20000).astype(np.int16))
    pd.DataFrame([{"patient": "patient01", "label": 1, "split": "train"}]).to_csv(
        d / "split.csv", index=False)
    window = WindowSpec(window_s=2.0)
    frags = D.build_vest_fragments(str(d), str(d / "split.csv"), "train", fs_out=4125,
                                   window=window, channels=[1, 2, 3, 4, 5, 6])
    assert len(frags) > 0
    assert frags[0].waveform.shape == (window.window_len(4125), 6)
    # ECG leads routed through the ECG chain
    frags_e = D.build_vest_fragments(str(d), str(d / "split.csv"), "train", fs_out=4125,
                                     window=window, channels=[1, "E"])
    assert frags_e[0].waveform.shape[1] == 2
    ds = D.vest_dataset(str(d), str(d / "split.csv"), "train", fs_out=4125, window=window,
                        channels=[1, 2], augment_num=1)
    item = ds[len(ds) - 1]
    assert item["waveform"].ndim == 2


# --- generated loader -----------------------------------------------------------

def test_generated_roundtrip(tmp_path):
    fs = 4000
    d = tmp_path / "gen"
    d.mkdir()
    rows = []
    for i in range(4):
        wav = (tone(100, fs, 6.2) * 30000).astype(np.int16)
        name = f"s{i}.wav"
        wavfile.write(str(d / name), fs, wav)
        rows.append({"patient": f"p{i}", "label": i % 2, "file": name})
    pd.DataFrame(rows).to_csv(d / "REFERENCE.csv", index=False)
    window = WindowSpec(window_s=4.0)
    frags = D.generated_fragments(str(d), fs_out=4125, window=window)
    assert len(frags) >= 4
    assert frags[0].waveform.shape == (window.window_len(4125),)
    some = D.generated_fragments(str(d), fs_out=4125, window=window, proportion=0.5, seed=0)
    assert 0 < len(some) < len(frags)


# --- heart cycles ----------------------------------------------------------------

def test_heart_cycles(tmp_path):
    fs = 1000
    seg = {"segments": [[0, 5], [250, 20], [500, 12], [760, 3]], "last_index": 1000, "fs": fs}
    p = tmp_path / "p1.json"
    p.write_text(json.dumps(seg))
    joins = D.heart_cycles.load_join_indices(p, fs_out=2000)
    assert joins == [500, 1000, 1520]
    x = tone(25, fs, 1.0)
    cycles = D.heart_cycles.split_cycles(x, D.heart_cycles.load_join_indices(p, fs))
    assert len(cycles) == 2
    rebuilt = D.heart_cycles.rebuild(cycles, 1200, fade_samples=20)
    assert len(rebuilt) >= 1200
    import random
    arranged = D.heart_cycles.rearrange({"a": cycles, "b": cycles},
                                        rng=random.Random(0))
    assert set(arranged) == {"a", "b"}
    assert len(arranged["a"]) == len(cycles)
    # identical ordering across signals
    for ca, cb in zip(arranged["a"], arranged["b"]):
        np.testing.assert_array_equal(ca, cb)


def test_crossfade_lengths():
    a, b = np.ones(100), np.ones(100)
    out = D.heart_cycles.crossfade(a, b, 20)
    assert len(out) == 180
    assert np.all(np.isfinite(out))


# --- generative dataset -------------------------------------------------------------

def test_generative_dataset_items(tmp_path):
    from wav2vec_heart_sounds_tpu.signal import MelConfig
    fs_raw = 2000
    d = tmp_path / "cincgen"
    d.mkdir()
    rows = []
    for i, lab in enumerate([1, -1]):
        pcg = tone(90, fs_raw, 8.0)
        wfdb_io.write_record(str(d / f"g{i}"), np.stack([pcg, tone(9, fs_raw, 8.0)], axis=1),
                             fs_raw, sig_names=["PCG", "ECG"])
        rows.append({"patient": f"g{i}", "abnormality": lab, "split": "train"})
    pd.DataFrame(rows).to_csv(d / "split.csv", index=False)

    mel = MelConfig(sample_rate=4000, n_fft=1024, hop_length=256, n_mels=80, f_max=500)
    ds = D.cinc_generative_dataset(str(d), str(d / "split.csv"), "train", fs=4000, mel=mel,
                                   crop_frames=96, hop_length=256)
    assert len(ds) == 2
    item = ds[0]
    assert item["ref_audio"].shape == (96 * 256,)
    assert item["con_spec"].shape == (80, 96)
    assert 0.0 <= item["con_spec"].min() and item["con_spec"].max() <= 1.0
    assert item["label"] in (0, 1)


def test_generative_dataset_cycle_rearrange(tmp_path):
    from wav2vec_heart_sounds_tpu.signal import MelConfig
    fs_raw = 2000
    d = tmp_path / "cincgen2"
    sd = tmp_path / "segs"
    d.mkdir(); sd.mkdir()
    pcg = tone(90, fs_raw, 8.0)
    wfdb_io.write_record(str(d / "g0"), pcg, fs_raw, sig_names=["PCG"])
    pd.DataFrame([{"patient": "g0", "abnormality": 1, "split": "train"}]).to_csv(
        d / "split.csv", index=False)
    joins = [[int(j), 0] for j in np.arange(1000, 15000, 1500)]
    (sd / "g0.json").write_text(json.dumps({"segments": joins, "fs": fs_raw}))

    mel = MelConfig(sample_rate=4000, n_fft=1024, hop_length=256, n_mels=80, f_max=500)
    ds = D.cinc_generative_dataset(str(d), str(d / "split.csv"), "train", fs=4000, mel=mel,
                                   crop_frames=96, hop_length=256, segment_dir=str(sd))
    item = ds[0]
    assert item["ref_audio"].shape == (96 * 256,)
    assert np.all(np.isfinite(item["ref_audio"]))


# --- schedule -------------------------------------------------------------------------

def _schedule_dict():
    return {
        "test_set": {"data": "d/test", "split": "s.csv", "segment": "seg"},
        "valid_set": {"data": "d/valid", "split": "s.csv", "segment": "seg"},
        "datasets": {
            "real": {"path": "d/real", "split": "s.csv", "segment": "seg",
                     "gen_data": False, "augment_num": 15},
            "gen": {"path": "d/gen", "split": "s.csv", "segment": "seg",
                    "gen_data": True, "augment_num": 0, "proportion": 0.5},
        },
        "combined_datasets": {
            "both": {"base_sets": ["real", "gen"], "proportion": [1.0, 0.5]},
        },
        "schedule": [
            {"key": "real", "epochs": 10},
            {"key": "gen", "epochs": 4, "letskip": True},
            {"key": "both", "epochs": 2},
        ],
    }


def test_schedule_parse_and_resolve(tmp_path):
    p = tmp_path / "sched.json"
    p.write_text(json.dumps(_schedule_dict()))
    sched = D.load_schedule(p)
    stages = sched.resolved_stages()
    assert [s[1] for s in stages] == [10, 4, 2]
    assert stages[1][2] is True
    assert sched.datasets["both"].combined
    assert tuple(sched.datasets["both"].base_sets) == ("real", "gen")
    assert "d/real" in sched.data_paths


def test_schedule_validation_errors():
    from wav2vec_heart_sounds_tpu.data import schedule as sched_mod
    bad = _schedule_dict()
    bad["schedule"].append({"key": "nope", "epochs": 1})
    with pytest.raises(ValueError, match="Invalid schedule"):
        sched_mod.from_dict(bad)
    bad2 = _schedule_dict()
    bad2["datasets"]["real"]["augment_num"] = -1
    with pytest.raises(ValueError, match="Invalid schedule"):
        sched_mod.from_dict(bad2)


def test_schedule_sources_normal_form(tmp_path):
    sched = D.schedule.from_dict(_schedule_dict())
    real = sched.datasets["real"]
    assert len(real.sources) == 1 and not real.combined
    assert real.sources[0].gen_data is False and real.sources[0].proportion == 1.0
    both = sched.datasets["both"]
    assert [s.path for s in both.sources] == ["d/real", "d/gen"]
    assert [s.proportion for s in both.sources] == [1.0, 0.5]
    # combined inherits min(base augment_num) when unspecified
    assert both.augment_num == 0


def test_subsample_patients_keeps_aug_copies_with_base():
    from wav2vec_heart_sounds_tpu.experiments.synthetic import subsample_patients
    frags = []
    for p in ("a", "b", "c", "d"):
        frags.append(D.Fragment(np.zeros(10, np.float32), 0, p))
        frags.append(D.Fragment(np.zeros(10, np.float32), 0, f"{p}#aug1"))
    kept = subsample_patients(frags, 0.5, seed=0)
    bases = {f.patient.split("#aug")[0] for f in kept}
    assert len(bases) == 2
    # every kept patient keeps both its base window and its augmented copy
    assert len(kept) == 4
    assert subsample_patients(frags, 1.0) is frags


def test_schedule_combined_of_combined_flattens_all_sources():
    """A combined set whose base is itself combined keeps every underlying source
    (reading only sources[0] used to silently drop the rest), with nested weights
    multiplying and plain-base weights replacing the base's own proportion."""
    raw = _schedule_dict()
    raw["combined_datasets"]["trio"] = {"base_sets": ["both", "gen"],
                                        "proportion": [0.5, 1.0]}
    raw["schedule"].append({"key": "trio", "epochs": 1})
    sched = D.schedule.from_dict(raw)
    trio = sched.datasets["trio"]
    assert [s.path for s in trio.sources] == ["d/real", "d/gen", "d/gen"]
    # 'both' contributes (real@1.0, gen@0.5) scaled by 0.5; plain 'gen' replaced by 1.0
    assert [s.proportion for s in trio.sources] == [0.5, 0.25, 1.0]
