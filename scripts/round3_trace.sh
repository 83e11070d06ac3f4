#!/bin/bash
# Stage 3 of the round-3 unattended measurement chain (after round3_sweep.sh and
# round3_extras.sh): capture a fresh profiler trace of the current headline config
# so the next perf lever can be picked from real per-op numbers, not the stale
# 516.5-era breakdown in PERF.md.
# Usage: bash scripts/round3_trace.sh [summary_out]
set -u
OUT="${1:-/tmp/round3_trace_summary.txt}"
cd "$(dirname "$0")/.."
rm -rf /tmp/jaxtrace
echo "=== trace capture $(date +%H:%M:%S)"
timeout 2400 python scripts/profile_step.py 2>&1 | tail -8
TRACE=$(find /tmp/jaxtrace -name '*.trace.json.gz' 2>/dev/null | head -1)
if [ -n "$TRACE" ]; then
    timeout 600 python scripts/trace_summary.py "$TRACE" 3 > "$OUT" 2>&1
    echo "=== trace summary -> $OUT"
    head -40 "$OUT"
else
    echo "=== no trace produced" | tee "$OUT"
fi
echo "=== trace done $(date +%H:%M:%S)"
