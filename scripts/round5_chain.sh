#!/bin/bash
# Round-5 measurement chain (VERDICT r4 item 2): every BASELINE.json flagship config
# measured 3x at the committed build, medians + spread recorded in BENCH_ALL.json, raw
# log archived at docs/artifacts/r5/chain.log. Levers (packed-master optimizer, patchdot
# pos_conv, paired preproc) are A/B'd separately before this chain runs; this chain runs
# everything at the committed defaults.
# Each mode retries: the relay tunnel drops transiently. Run on an idle host.
# Usage: bash scripts/round5_chain.sh [outdir]
set -u
D="${1:-/tmp/r5chain}"
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

# 3 runs per config (VERDICT r4: single-run records cannot support deltas on a tunnel
# with ±5-10% cross-run drift; medians + spread go into BENCH_ALL.json).
for i in 1 2 3; do run_mode train 2400; done
for i in 1 2 3; do run_mode vest 4800; done
run_mode vest 4800 W2VHS_VEST_DEVAUG=1           # devaug decision A/B (VERDICT item 6)
for i in 1 2 3; do run_mode fusion 3600; done
for i in 1 2 3; do run_mode gen-train 2400; done
for i in 1 2 3; do run_mode gen-train-wavegrad 2400; done
for i in 1 2 3; do run_mode gen 1800; done
for i in 1 2 3; do run_mode gen-wavegrad 1800; done

echo "=== trace capture $(date +%H:%M:%S)" | tee -a "$D/chain.log"
rm -rf /tmp/jaxtrace
timeout 2400 python scripts/profile_step.py 2>&1 | tail -6 | tee -a "$D/chain.log"
TRACE=$(find /tmp/jaxtrace -name '*.trace.json.gz' 2>/dev/null | head -1)
if [ -n "$TRACE" ]; then
    echo "=== trace summary -> $D/trace_summary.txt" | tee -a "$D/chain.log"
    timeout 600 python scripts/trace_summary.py "$TRACE" > "$D/trace_summary.txt" 2>&1
fi
echo "=== chain done $(date +%H:%M:%S)" | tee -a "$D/chain.log"
