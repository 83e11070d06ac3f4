"""Real-chip smoke: the full classify-cinc path (full-size wav2vec2) on synthetic records.

Exercises build_classifier -> SupervisedTrainer jit train/eval steps -> fragment+patient
evaluation on the TPU, end to end, with the production model size. Prints the result record.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np
import pandas as pd


def main():
    from wav2vec_heart_sounds_tpu.data import wfdb_io
    from wav2vec_heart_sounds_tpu.experiments import cinc

    fs_raw = 2000
    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(8):
            lab = 1 if i % 2 else -1
            freq = 95 if lab == 1 else 60
            t = np.arange(int(fs_raw * 10.0)) / fs_raw
            pcg = np.sin(2 * np.pi * freq * t) + 0.1 * rng.normal(size=t.size)
            wfdb_io.write_record(str(d / f"s{i:04d}"), pcg, fs_raw, sig_names=["PCG"])
            split = "train" if i < 5 else ("valid" if i < 7 else "test")
            rows.append({"patient": f"s{i:04d}", "abnormality": lab, "split": split})
        pd.DataFrame(rows).to_csv(d / "split.csv", index=False)

        record = cinc.run(
            str(d), str(d / "split.csv"), mode="pcg", fs=16000, window_s=4.0,
            epochs=1, augment=False, random_init=True, batch_size=8, max_batches=3,
            run_label="tpu-smoke",
        )
        print(json.dumps({k: v for k, v in record.items()
                          if k in ("fragment", "patient", "run_label")}, indent=2))


if __name__ == "__main__":
    main()
