#!/bin/bash
# Round-4 measurement chain (VERDICT r3 item 7): one internally-consistent set of
# numbers for every BASELINE.json flagship config, committed to BENCH_ALL.json/PERF.md.
# Order:
#   1. round-4 lever A/B: W2VHS_ATTN_OUT=bthd vs default on the headline train step
#   2. headline confirm at whatever default wins
#   3. vest (post-fix): three consecutive clean runs demanded by the VERDICT,
#      plus the device-augment variant
#   4. fusion + generative train/sampling (both models)
#   5. fresh trace at the new steady state
# Each mode retries: the relay tunnel drops transiently. Run on an idle host.
# Usage: bash scripts/round4_chain.sh [outdir]
set -u
D="${1:-/tmp/r4chain}"
mkdir -p "$D"
cd "$(dirname "$0")/.."

run_mode () {
    local m="$1" t="${2:-3000}" attempt out rc
    for attempt in 1 2 3; do
        echo "=== mode=$m attempt=$attempt env=${3:-} $(date +%H:%M:%S)" | tee -a "$D/chain.log"
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

if [ "${SKIP_AB:-0}" != "1" ]; then
    echo "=== lever A/B: attention out-layout $(date +%H:%M:%S)" | tee -a "$D/chain.log"
    run_mode train 2400 W2VHS_ATTN_OUT=bhtd
    run_mode train 2400 W2VHS_ATTN_OUT=bthd
fi

# headline confirm at the committed default
run_mode train 2400

# vest: the VERDICT's done-bar is 3 consecutive clean runs
run_mode vest 4800
run_mode vest 4800
run_mode vest 4800
run_mode vest 4800 W2VHS_VEST_DEVAUG=1

run_mode fusion 3600
run_mode gen-train 2400
run_mode gen-train-wavegrad 2400
run_mode gen 1800
run_mode gen-wavegrad 1800

echo "=== trace capture $(date +%H:%M:%S)" | tee -a "$D/chain.log"
rm -rf /tmp/jaxtrace
timeout 2400 python scripts/profile_step.py 2>&1 | tail -6 | tee -a "$D/chain.log"
TRACE=$(find /tmp/jaxtrace -name '*.trace.json.gz' 2>/dev/null | head -1)
if [ -n "$TRACE" ]; then
    echo "=== trace summary -> $D/trace_summary.txt" | tee -a "$D/chain.log"
    timeout 600 python scripts/trace_summary.py "$TRACE" > "$D/trace_summary.txt" 2>&1
fi
echo "=== chain done $(date +%H:%M:%S)" | tee -a "$D/chain.log"
