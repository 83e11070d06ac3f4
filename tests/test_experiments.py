"""End-to-end experiment runners on synthetic fixtures — the minimum slice of SURVEY.md §7.

make-splits on a synthetic REFERENCE.csv -> classify-cinc (random-init, tiny encoder,
max-batches) exercising preprocess -> segment -> fragments -> balanced loader -> train ->
fragment+patient evaluate -> results JSON; plus the vest and synthetic-schedule runners and
the reporting pipeline.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

from wav2vec_heart_sounds_tpu.data import wfdb_io
from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Config

TINY = Wav2Vec2Config.tiny()
FS_RAW = 1000
FS_OUT = 1000


def tone(freq, fs, seconds):
    t = np.arange(int(fs * seconds)) / fs
    return np.sin(2 * np.pi * freq * t)


@pytest.fixture
def cinc_fixture(tmp_path):
    d = tmp_path / "db"
    d.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        lab = 1 if i % 2 else -1
        pcg = tone(90 if lab == 1 else 60, FS_RAW, 6.0) + 0.05 * rng.normal(size=6000)
        ecg = tone(8, FS_RAW, 6.0)
        wfdb_io.write_record(str(d / f"a{i:04d}"), np.stack([pcg, ecg], 1), FS_RAW,
                             sig_names=["PCG", "ECG"])
        rows.append({"patient": f"a{i:04d}", "abnormality": lab,
                     "split": ["train", "train", "train", "train", "valid", "test"][i]})
    pd.DataFrame(rows).to_csv(d / "split.csv", index=False)
    return d


def test_make_splits_to_classify_cinc_slice(cinc_fixture, tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import cinc

    results = tmp_path / "results.json"
    record = cinc.run(
        str(cinc_fixture), str(cinc_fixture / "split.csv"),
        mode="pcg", fs=FS_OUT, window_s=2.0, epochs=1, augment=False,
        random_init=True, batch_size=4, max_batches=2,
        results_json=str(results), encoder_config=TINY, run_label="slice",
    )
    assert record["topology"] == "wav2vec"
    assert "fragment" in record and "patient" in record
    assert 0.0 <= record["fragment"]["accuracy"] <= 1.0
    saved = json.loads(results.read_text())
    assert len(saved) == 1 and saved[0]["run_label"] == "slice"


def test_classify_cinc_two_branch_fusion(cinc_fixture, tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import cinc

    record = cinc.run(
        str(cinc_fixture), str(cinc_fixture / "split.csv"),
        mode="pcg_ecg", fs=FS_OUT, window_s=2.0, epochs=1, augment=False,
        random_init=True, batch_size=4, max_batches=1, encoder_config=TINY,
    )
    assert record["topology"] == "big_rnn:2:wav2vec"
    assert "patient" in record


def test_classify_lsdo(cinc_fixture, tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import cinc

    dbs = {"a": (str(cinc_fixture), str(cinc_fixture / "split.csv")),
           "b": (str(cinc_fixture), str(cinc_fixture / "split.csv"))}
    record = cinc.run_leave_out_db(dbs, "b", fs=FS_OUT, window_s=2.0, epochs=1,
                                   augment=False, random_init=True, batch_size=4,
                                   max_batches=1, encoder_config=TINY)
    assert record["leave_out_db"] == "b"


def test_classify_vest_runner(tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import multichannel

    d = tmp_path / "vest"
    d.mkdir()
    fs = 2000
    sig = np.stack([tone(80 + 10 * c, fs, 6.0) for c in range(9)], axis=1)
    for pat in ("patientA", "patientB"):
        wavfile.write(str(d / f"{pat}_rec.wav"), fs, (sig * 20000).astype(np.int16))
    pd.DataFrame([
        {"patient": "patientA", "label": 1, "split": "train"},
        {"patient": "patientB", "label": -1, "split": "train"},
        {"patient": "patientA", "label": 1, "split": "valid"},
        {"patient": "patientB", "label": -1, "split": "test"},
    ]).to_csv(d / "split.csv", index=False)

    record = multichannel.run(
        str(d), str(d / "split.csv"), channels=[1, 2, 3], fs=FS_OUT, window_s=2.0,
        epochs=1, augment=False, random_init=True, lora=False, fit_svm=True,
        batch_size=2, max_batches=1, encoder_config=TINY,
    )
    assert "mlp" in record and "svm" in record
    assert 0.0 <= record["svm"]["accuracy"] <= 1.0


def test_classify_vest_contrastive_focal(tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import multichannel

    d = tmp_path / "vest"
    d.mkdir()
    fs = 2000
    sig = np.stack([tone(90, fs, 5.0) for _ in range(7)], axis=1)
    wavfile.write(str(d / "p1_rec.wav"), fs, (sig * 20000).astype(np.int16))
    pd.DataFrame([
        {"patient": "p1", "label": 1, "split": s} for s in ("train", "valid", "test")
    ]).to_csv(d / "split.csv", index=False)
    record = multichannel.run(
        str(d), str(d / "split.csv"), channels=[1, 2], fs=FS_OUT, window_s=2.0,
        epochs=1, augment=False, random_init=True, lora=False, fit_svm=False,
        loss="contrastive-focal", batch_size=2, max_batches=1, encoder_config=TINY,
    )
    assert "mlp" in record


def test_classify_synthetic_schedule(cinc_fixture, tmp_path):
    from wav2vec_heart_sounds_tpu.experiments import synthetic

    # generated dataset directory
    gen = tmp_path / "gen"
    gen.mkdir()
    rows = []
    for i in range(3):
        wavfile.write(str(gen / f"g{i}.wav"), FS_OUT,
                      (tone(70, FS_OUT, 4.0) * 20000).astype(np.int16))
        rows.append({"patient": f"g{i}", "label": i % 2, "file": f"g{i}.wav"})
    pd.DataFrame(rows).to_csv(gen / "REFERENCE.csv", index=False)

    sched = {
        "test_set": {"data": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                     "segment": ""},
        "valid_set": {"data": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                      "segment": ""},
        "datasets": {
            "real": {"path": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                     "segment": "", "gen_data": False, "augment_num": 0},
            "gen": {"path": str(gen), "split": "", "segment": "", "gen_data": True,
                    "augment_num": 0, "proportion": 1.0},
        },
        "schedule": [
            {"key": "real", "epochs": 1},
            {"key": "gen", "epochs": 1, "letskip": True},
        ],
    }
    sched_path = tmp_path / "sched.json"
    sched_path.write_text(json.dumps(sched))

    record = synthetic.run(str(sched_path), fs=FS_OUT, window_s=2.0, random_init=True,
                           batch_size=4, max_batches=1, encoder_config=TINY)
    assert record["schedule"] == str(sched_path)
    assert "patient" in record


def test_reporting_roundtrip(tmp_path):
    from wav2vec_heart_sounds_tpu import reporting
    from wav2vec_heart_sounds_tpu.experiments.common import append_result

    results = tmp_path / "r.json"
    for mcc in (0.5, 0.7):
        append_result(str(results), {
            "run_label": "A", "mode": "pcg",
            "fragment": {"accuracy": 0.8, "mcc": mcc},
            "patient": {"accuracy": 0.9, "mcc": mcc + 0.1},
        })
    records = reporting.load_results(results)
    flat = reporting.flatten_metrics(records[0])
    assert flat["patient.mcc"] == 0.6 and "fragment.accuracy" in flat
    summary = reporting.summarize(records, group_by=["run_label"])
    mean, std, n = summary["run_label=A"]["fragment.mcc"]
    assert n == 2 and mean == pytest.approx(0.6) and std == pytest.approx(0.1)
    table = reporting.to_markdown(summary, metrics=["mcc", "accuracy"])
    assert "run_label=A" in table and "0.6000±0.1000" in table


def test_reference_rnn_regime_halves_epochs(cinc_fixture):
    """Pin the legacy regime rule: half epochs + augmented validation (intent test)."""
    from wav2vec_heart_sounds_tpu.experiments import cinc

    record = cinc.run(
        str(cinc_fixture), str(cinc_fixture / "split.csv"),
        mode="pcg", fs=FS_OUT, window_s=2.0, epochs=2, augment=False,
        random_init=True, reference_train_rnn=True, batch_size=4, max_batches=1,
        encoder_config=TINY,
    )
    assert record["train_epochs"] == 1 and record["epochs"] == 2


def test_classify_cinc_device_augment(cinc_fixture, tmp_path):
    """The fused on-device augmentation path trains end-to-end (VERDICT round-1 #6)."""
    from wav2vec_heart_sounds_tpu.experiments import cinc

    record = cinc.run(
        str(cinc_fixture), str(cinc_fixture / "split.csv"),
        mode="pcg", fs=FS_OUT, window_s=2.0, epochs=1, augment=False,
        random_init=True, batch_size=4, max_batches=2, device_augment=True,
        results_json=str(tmp_path / "r.json"), encoder_config=TINY,
    )
    assert "fragment" in record and 0.0 <= record["fragment"]["accuracy"] <= 1.0


def test_synthetic_letskip_skips_on_no_improvement(cinc_fixture, tmp_path, monkeypatch):
    """A letskip stage is skipped when the previous stage did not improve validation MCC."""
    from wav2vec_heart_sounds_tpu.experiments import synthetic
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fits = []
    orig_fit = SupervisedTrainer.fit

    def spy_fit(self, *a, **kw):
        fits.append(kw.get("label", ""))
        orig_fit(self, *a, **kw)
        return -1.0   # force "no improvement" after the first stage

    monkeypatch.setattr(SupervisedTrainer, "fit", spy_fit)
    sched = {
        "test_set": {"data": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                     "segment": ""},
        "valid_set": {"data": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                      "segment": ""},
        "datasets": {
            "real": {"path": str(cinc_fixture), "split": str(cinc_fixture / "split.csv"),
                     "segment": "", "gen_data": False, "augment_num": 0,
                     "proportion": 1.0},
        },
        "schedule": [
            {"key": "real", "epochs": 1},
            {"key": "real", "epochs": 1},              # not letskip: runs even w/o improvement
            {"key": "real", "epochs": 1, "letskip": True},   # letskip: skipped
        ],
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(sched))
    record = synthetic.run(str(p), fs=FS_OUT, window_s=2.0, random_init=True,
                           batch_size=4, max_batches=1, encoder_config=TINY)
    assert len(fits) == 2
    assert record["skipped_stages"] == ["real"]


def test_classify_cinc_raw_wire(cinc_fixture, tmp_path):
    """Raw-wire mode: low-rate raw windows over the wire, preprocessing + augmentation on
    device (the transfer-bound relay design, PERF.md; no reference analogue)."""
    from wav2vec_heart_sounds_tpu.experiments import cinc

    record = cinc.run(
        str(cinc_fixture), str(cinc_fixture / "split.csv"),
        mode="pcg", fs=FS_OUT, window_s=2.0, epochs=1, augment=False,
        random_init=True, batch_size=4, max_batches=2, wire="raw", fs_wire=500,
        results_json=str(tmp_path / "r.json"), encoder_config=TINY,
    )
    assert record["wire"] == "raw"
    assert "fragment" in record and 0.0 <= record["fragment"]["accuracy"] <= 1.0

    with pytest.raises(ValueError):
        cinc.run(str(cinc_fixture), str(cinc_fixture / "split.csv"), mode="pcg_ecg",
                 fs=FS_OUT, window_s=2.0, epochs=1, wire="raw", encoder_config=TINY)


@pytest.mark.fast
def test_classify_vest_device_augment(tmp_path):
    """--device-augment: host residue (stretch only) + batched on-device noise/wander."""
    from wav2vec_heart_sounds_tpu.experiments import multichannel

    d = tmp_path / "vest"
    d.mkdir()
    fs = 2000
    sig = np.stack([tone(80 + 10 * c, fs, 6.0) for c in range(9)], axis=1)
    for pat in ("patientA", "patientB"):
        wavfile.write(str(d / f"{pat}_rec.wav"), fs, (sig * 20000).astype(np.int16))
    pd.DataFrame([
        {"patient": "patientA", "label": 1, "split": "train"},
        {"patient": "patientB", "label": -1, "split": "train"},
        {"patient": "patientA", "label": 1, "split": "valid"},
        {"patient": "patientB", "label": -1, "split": "test"},
    ]).to_csv(d / "split.csv", index=False)

    record = multichannel.run(
        str(d), str(d / "split.csv"), channels=[1, 2, 3], fs=FS_OUT, window_s=2.0,
        epochs=1, augment=True, device_augment=True, random_init=True, lora=False,
        fit_svm=False, batch_size=2, max_batches=1, encoder_config=TINY,
    )
    assert "mlp" in record
    assert 0.0 <= record["mlp"]["fragment"]["accuracy"] <= 1.0
