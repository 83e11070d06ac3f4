"""WFDB decoder coverage for formats 80, 24 and 32 plus header parsing variants."""

import numpy as np

from wav2vec_heart_sounds_tpu.data import wfdb_io

import pytest

pytestmark = pytest.mark.fast

def test_format80(tmp_path):
    vals = np.array([0, 1, -1, 100, -127, 127], dtype=np.int32)
    (tmp_path / "r.dat").write_bytes(bytes((vals + 128).astype(np.uint8)))
    (tmp_path / "r.hea").write_text("r 1 250 6\nr.dat 80 100(0)/mV 8 0 0 0 0 X\n")
    rec = wfdb_io.read_record(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal[:, 0], vals / 100.0)


def test_format24(tmp_path):
    vals = np.array([0, 1, -1, (1 << 22), -(1 << 22)], dtype=np.int64)
    raw = bytearray()
    for v in vals:
        u = int(v) & 0xFFFFFF
        raw += bytes([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF])
    (tmp_path / "r.dat").write_bytes(bytes(raw))
    (tmp_path / "r.hea").write_text("r 1 500 5\nr.dat 24 1000(0)/mV 24 0 0 0 0 X\n")
    rec = wfdb_io.read_record(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal[:, 0], vals / 1000.0)


def test_format32(tmp_path):
    vals = np.array([0, 123456, -987654], dtype=np.int32)
    (tmp_path / "r.dat").write_bytes(vals.astype("<i4").tobytes())
    (tmp_path / "r.hea").write_text("r 1 1000 3\nr.dat 32 200(10)/uV 32 0 0 0 0 X\n")
    rec = wfdb_io.read_record(str(tmp_path / "r"))
    np.testing.assert_allclose(rec.p_signal[:, 0], (vals - 10) / 200.0)


def test_header_variants(tmp_path):
    # fs with counter suffix, format with sample-skew suffix, gain without baseline
    (tmp_path / "r.hea").write_text(
        "r 2 360/1000 4\nr.dat 16x1 200/mV 12 7 0 0 0 ECG1\nr.dat 16 0 12 0 0 0 0 ECG2\n")
    h = wfdb_io.read_header(str(tmp_path / "r"))
    assert h.fs == 360.0 and h.n_sig == 2 and h.sig_len == 4
    assert h.formats == [16, 16]
    assert h.baselines[0] == 7          # defaults to adc_zero when no (baseline)
    assert h.gains[1] == 200.0          # zero gain -> WFDB default 200
    assert h.sig_names == ["ECG1", "ECG2"]


def test_comments_and_missing_fields(tmp_path):
    (tmp_path / "r.hea").write_text("# a comment\nr 1 100 10\nr.dat 16\n")
    h = wfdb_io.read_header(str(tmp_path / "r"))
    assert h.gains == [200.0] and h.baselines == [0]
