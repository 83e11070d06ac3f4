#!/bin/bash
# Remaining round-3 measurement chain (the lever A/Bs already landed in /tmp/r3/levers.log:
# hb12 560.4 / attn_dn 561.9 / ffn_tanh 566.2 / dn+tanh 566.1 vs erf-default 560.6 —
# tanh is now the committed default; the post-default headline confirm read 568.3).
# Runs sequentially on an otherwise-idle host:
#   1. headline confirm at the new default (skip with SKIP_TRAIN=1 if already captured)
#   2. the three never-benched flagship configs (vest x2, fusion)
#   3. generative train + sampling, DiffWave and WaveGrad
#   4. extras: gen sampling batch sweep, train-batch re-check
#   5. fresh profiler trace at the new headline
# Each mode retries up to 3x: the relay tunnel drops connections transiently
# ("response body closed before all bytes were read") and a retry usually lands.
# Usage: bash scripts/round3_chain.sh [outdir]
set -u
D="${1:-/tmp/r3}"
mkdir -p "$D"
cd "$(dirname "$0")/.."

run_mode () {
    local m="$1" t="${2:-3000}" attempt out rc
    for attempt in 1 2 3; do
        echo "=== mode=$m attempt=$attempt $(date +%H:%M:%S)" | tee -a "$D/chain.log"
        out=$( ( export ${3:-_IGNORE=0}; timeout "$t" python bench.py --mode="$m" 2>&1 ) )
        rc=$?
        echo "$out" | grep -v -e WARNING -e Warning | tail -2 | tee -a "$D/chain.log"
        if [ $rc -eq 0 ] && echo "$out" | grep -q '^{.*"metric"'; then
            return 0
        fi
        echo "--- mode=$m attempt=$attempt failed rc=$rc; sleeping 120s" | tee -a "$D/chain.log"
        sleep 120
    done
    echo "--- mode=$m GAVE UP after 3 attempts" | tee -a "$D/chain.log"
    return 1
}

if [ "${SKIP_TRAIN:-0}" != "1" ]; then
    run_mode train 2400
fi
run_mode vest 4800
run_mode vest 4800 W2VHS_VEST_DEVAUG=1
run_mode fusion 3600
run_mode gen-train 2400
run_mode gen-train-wavegrad 2400
run_mode gen 1800
run_mode gen-wavegrad 1800

echo "=== gen batch sweep $(date +%H:%M:%S)" | tee -a "$D/chain.log"
for B in 16 32; do
    timeout 1800 python -c "
import bench, json
print(json.dumps(bench.run_gen_bench(batch_size=$B)))" 2>&1 | tail -1 | tee -a "$D/chain.log"
done

echo "=== train batch re-check $(date +%H:%M:%S)" | tee -a "$D/chain.log"
timeout 3600 python scripts/batch_sweep.py 112,128 2>&1 | grep -e '^{' | tee -a "$D/chain.log"

echo "=== trace capture $(date +%H:%M:%S)" | tee -a "$D/chain.log"
rm -rf /tmp/jaxtrace
timeout 2400 python scripts/profile_step.py 2>&1 | tail -6 | tee -a "$D/chain.log"
TRACE=$(find /tmp/jaxtrace -name '*.trace.json.gz' 2>/dev/null | head -1)
if [ -n "$TRACE" ]; then
    timeout 900 python scripts/trace_summary.py "$TRACE" 3 > "$D/trace_summary.txt" 2>&1
    echo "=== trace summary -> $D/trace_summary.txt" | tee -a "$D/chain.log"
fi
echo "=== chain done $(date +%H:%M:%S)" | tee -a "$D/chain.log"
