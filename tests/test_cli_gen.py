"""CLI-level generative round trip: gen-train -> gen-sample -> generated_fragments.

Uses a tiny crop (2 conditioning frames) so the full-size DiffWave runs in seconds on CPU.
"""

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from wav2vec_heart_sounds_tpu.cli import cli
from wav2vec_heart_sounds_tpu.data import generated_fragments, wfdb_io
from wav2vec_heart_sounds_tpu.signal import WindowSpec


@pytest.fixture
def gen_fixture(tmp_path):
    fs = 2000
    d = tmp_path / "db"
    d.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, lab in enumerate([1, -1]):
        t = np.arange(int(fs * 2.0)) / fs
        pcg = np.sin(2 * np.pi * 80 * t) + 0.05 * rng.normal(size=t.size)
        wfdb_io.write_record(str(d / f"g{i}"), pcg, fs, sig_names=["PCG"])
        rows.append({"patient": f"g{i}", "abnormality": lab, "split": "train"})
    pd.DataFrame(rows).to_csv(d / "split.csv", index=False)
    return d


def test_gen_train_and_sample_roundtrip(gen_fixture, tmp_path):
    out = tmp_path / "model"
    runner = CliRunner()
    result = runner.invoke(cli, [
        "gen-train", "--model", "diffwave", "--data-dir", str(gen_fixture),
        "--csv", str(gen_fixture / "split.csv"), "--output-dir", str(out),
        "--epochs", "1", "--batch-size", "2", "--crop-frames", "2",
        "--max-train-batches", "1", "--no-bf16",
    ])
    assert result.exit_code == 0, result.output
    assert (out / "weights.msgpack").exists()

    gen_dir = tmp_path / "generated"
    result = runner.invoke(cli, [
        "gen-sample", "--model", "diffwave", "--weights", str(out / "weights.msgpack"),
        "--data-dir", str(gen_fixture), "--csv", str(gen_fixture / "split.csv"),
        "--output-dir", str(gen_dir), "--per-item", "1", "--crop-frames", "2",
    ])
    assert result.exit_code == 0, result.output
    frags = generated_fragments(str(gen_dir), fs_out=4000,
                                window=WindowSpec(window_s=0.1, overlap_s=0.02,
                                                  start_pad_s=0.0))
    assert len(frags) >= 2
