#!/bin/bash
# Post-sweep extras: run after round3_sweep.sh completes (polls its log).
# 1) gen sampling batch sweep (batched generate_dataset makes larger B the real config)
# 2) train-batch re-check at the round-3 memory picture (recompute VJP freed activations)
# Usage: bash scripts/round3_extras.sh [sweep_log] [outfile]
set -u
LOG="${1:-/tmp/round3_sweep.log}"
OUT="${2:-/tmp/round3_extras.jsonl}"
: > "$OUT"
echo "=== waiting for sweep to finish $(date +%H:%M:%S)"
for i in $(seq 1 600); do
    grep -q "sweep done" "$LOG" && break
    sleep 60
done
grep -q "sweep done" "$LOG" || { echo "sweep never finished"; exit 1; }

echo "=== gen batch sweep $(date +%H:%M:%S)"
for B in 16 32; do
    timeout 1800 python -c "
import bench, json
print(json.dumps(bench.run_gen_bench(batch_size=$B)))" 2>&1 | tail -1 | tee -a "$OUT"
done

echo "=== train batch re-check $(date +%H:%M:%S)"
timeout 3600 python scripts/batch_sweep.py 112,128 2>&1 | grep -e '^{' | tee -a "$OUT"
echo "=== extras done $(date +%H:%M:%S)"
