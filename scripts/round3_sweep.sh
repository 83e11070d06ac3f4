#!/bin/bash
# Round-3 flagship-config sweep: one JSON line per BASELINE.json config.
# Waits for the relay TPU to come back, then runs each bench mode sequentially
# (never concurrently — 1-CPU host, and the timed loops include host work).
# Usage: bash scripts/round3_sweep.sh [outfile]
set -u
OUT="${1:-/tmp/round3_sweep.jsonl}"
: > "$OUT"

echo "=== waiting for TPU $(date +%H:%M:%S)"
for i in $(seq 1 120); do
    if timeout 240 python -c "import jax; assert jax.default_backend() != 'cpu', jax.devices()" 2>/dev/null; then
        echo "=== TPU up $(date +%H:%M:%S)"; break
    fi
    echo "  probe $i failed $(date +%H:%M:%S)"; sleep 60
done

run_mode () {
    local m="$1" t="${2:-3000}"
    echo "=== mode=$m $(date +%H:%M:%S)"
    ( export ${3:-_IGNORE=0}; timeout "$t" python bench.py --mode="$m" 2>&1 \
        | grep -v -e WARNING -e Warning | tail -2 ) | tee -a "$OUT"
}

# Priority order (the relay may return with little round time left): headline confirm,
# then the last unmeasured round-2 lever (d) — attention head-block A/B with all 12 heads
# per program — then the three never-benched flagship configs, then the gen modes.
run_mode train 2400
run_mode train 2400 W2VHS_ATTN_VMEM_MB=16
run_mode vest 3600
run_mode vest 3600 W2VHS_VEST_DEVAUG=1
run_mode fusion 3000
run_mode gen-train 2400
run_mode gen-train-wavegrad 2400
run_mode gen 1800
run_mode gen-wavegrad 1800
echo "=== sweep done $(date +%H:%M:%S)"
