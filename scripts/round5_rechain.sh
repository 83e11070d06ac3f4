#!/bin/bash
# Round-5 re-measurement of the configs whose chain medians landed in the documented
# stall-degraded tunnel regime (PERF.md "Round-5 numbers of record"): vest, fusion, and
# both generative train configs. Runs at the committed build in a verified-clean regime
# (headline read 594.9 w/s immediately before this chain started) so the round's
# BENCH_ALL medians reflect the build, not the relay weather.
# Usage: bash scripts/round5_rechain.sh [outdir]
set -u
D="${1:-/tmp/r5rechain}"
mkdir -p "$D"
cd "$(dirname "$0")/.."

run_mode () {
    local m="$1" t="${2:-3000}" attempt out rc
    for attempt in 1 2 3; do
        echo "=== mode=$m attempt=$attempt env=${3:-} $(date +%H:%M:%S)" | tee -a "$D/chain2.log"
        out=$( ( export ${3:-_IGNORE=0}; timeout "$t" python bench.py --mode="$m" 2>&1 ) )
        rc=$?
        echo "$out" | grep -v -e WARNING -e Warning | tail -2 | tee -a "$D/chain2.log"
        if [ $rc -eq 0 ] && echo "$out" | grep -q '^{.*"metric"'; then
            return 0
        fi
        echo "--- mode=$m attempt=$attempt failed rc=$rc; sleeping 60s" | tee -a "$D/chain2.log"
        sleep 60
    done
    echo "--- mode=$m GAVE UP after 3 attempts" | tee -a "$D/chain2.log"
    return 1
}

for i in 1 2 3; do run_mode vest 4800; done
run_mode vest 4800 W2VHS_VEST_DEVAUG=1           # devaug A/B rides along
for i in 1 2 3; do run_mode fusion 3600; done
for i in 1 2 3; do run_mode gen-train 2400; done
for i in 1 2 3; do run_mode gen-train-wavegrad 2400; done
echo "=== rechain done $(date +%H:%M:%S)" | tee -a "$D/chain2.log"
