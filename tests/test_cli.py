"""CLI surface smoke tests via click's runner (cheap commands only)."""

import json

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from wav2vec_heart_sounds_tpu.cli import cli


def test_cli_lists_all_commands():
    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    for cmd in ("make-splits", "summarize", "gen-train", "gen-sample", "classify-cinc",
                "classify-vest", "classify-synthetic", "classify-lsdo", "bench"):
        assert cmd in result.output


def test_cli_make_splits(tmp_path):
    d = tmp_path / "db"
    d.mkdir()
    with open(d / "REFERENCE.csv", "w") as fh:
        for i in range(30):
            fh.write(f"rec{i:03d},{1 if i % 3 == 0 else -1}\n")
    out = tmp_path / "splits.csv"
    result = CliRunner().invoke(cli, ["make-splits", "--data-dir", str(d),
                                      "--out", str(out), "--folds", "2"])
    assert result.exit_code == 0, result.output
    df = pd.read_csv(out)
    assert len(df) == 30 and {"split", "split2"} <= set(df.columns)


def test_cli_summarize(tmp_path):
    results = tmp_path / "r.json"
    results.write_text(json.dumps([
        {"run_label": "x", "patient": {"mcc": 0.5, "accuracy": 0.8}},
        {"run_label": "x", "patient": {"mcc": 0.7, "accuracy": 0.9}},
    ]))
    out = tmp_path / "table.md"
    result = CliRunner().invoke(cli, ["summarize", str(results), "--out", str(out)])
    assert result.exit_code == 0, result.output
    assert "run_label=x" in out.read_text()


def test_shipped_schedule_configs_parse():
    import glob
    from wav2vec_heart_sounds_tpu.data.schedule import load_schedule

    paths = glob.glob("configs/schedule_*.json")
    assert len(paths) == 4
    for p in paths:
        sched = load_schedule(p)
        assert len(sched.stages) >= 3
