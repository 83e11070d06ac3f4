"""Collect round-5 chain results into BENCH_ALL.json (3-run medians + spread).

Parses the JSON result lines out of a chain log (scripts/round5_chain.sh output),
groups them by metric, and writes per-config entries with ``runs`` (every reading, in
order), ``value`` (median) and ``spread`` (max-min) — the round-4 verdict's provenance
standard: no number of record without an archived log and a recorded spread.

Usage: python scripts/collect_bench_all.py docs/artifacts/r5/chain.log [BENCH_ALL.json]
"""

from __future__ import annotations

import json
import re
import statistics
import sys
from pathlib import Path

METRIC_TO_CONFIG = {
    "pcg_4s_windows_per_sec_per_chip_e2e": "cinc_pcg_train",
    "fusion_4s_windows_per_sec_per_chip_e2e": "fusion_train",
    "vest_2s_windows_per_sec_per_chip_real_loop": "vest_beamformer_lora_train",
    "diffwave_train_audio_s_per_s": "diffwave_gen_train",
    "wavegrad_train_audio_s_per_s": "wavegrad_gen_train",
    "diffwave_fast_sampling_audio_s_per_s": "diffwave_fast_sampling",
    "wavegrad_sampling_audio_s_per_s": "wavegrad_sampling",
}


def collect(log_path: str) -> dict[str, list[dict]]:
    runs: dict[str, list[dict]] = {}
    env = ""
    for line in Path(log_path).read_text().splitlines():
        m = re.match(r"=== mode=\S+ attempt=\d+ env=(\S*)", line)
        if m:
            env = m.group(1)
            continue
        line = line.strip()
        if not line.startswith('{"metric"'):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("value") is None:
            continue
        rec["_env"] = env
        runs.setdefault(rec["metric"], []).append(rec)
    return runs


def main() -> None:
    log_path = sys.argv[1]
    bench_all_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_ALL.json"
    runs = collect(log_path)
    bench_all = json.loads(Path(bench_all_path).read_text())

    for metric, recs in sorted(runs.items()):
        cfg_key = METRIC_TO_CONFIG.get(metric)
        if cfg_key is None:
            continue
        default_recs = [r for r in recs if "DEVAUG" not in r["_env"]]
        if not default_recs:
            continue
        values = [r["value"] for r in default_recs]
        med = statistics.median(values)
        entry = bench_all["configs"].setdefault(cfg_key, {})
        prev = entry.get("value")
        entry.update({
            "metric": metric,
            "value": round(med, 3),
            "runs": values,
            "spread": round(max(values) - min(values), 3),
            "round": 5,
            "unit": default_recs[0].get("unit"),
            "vs_baseline": round(statistics.median(
                [r["vs_baseline"] for r in default_recs if r.get("vs_baseline")]), 1),
            "batch_size": default_recs[0].get("batch_size"),
        })
        print(f"{cfg_key}: {prev} -> median {med} (runs {values})")
        extra = [r["value"] for r in recs if "DEVAUG" in r["_env"]]
        if extra:
            entry["devaug_runs"] = extra
            print(f"  devaug runs: {extra}")

    Path(bench_all_path).write_text(json.dumps(bench_all, indent=1) + "\n")
    print(f"wrote {bench_all_path}")


if __name__ == "__main__":
    main()
