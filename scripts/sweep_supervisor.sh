#!/bin/bash
# Keeps the round-3 bench sweep alive across arbitrarily long relay outages.
#
# round3_sweep.sh gives up after 120 TPU probes (~10 h) and round3_extras.sh
# waits at most 10 h for the sweep to finish; a multi-hour outage (observed
# twice this round) can outlive both. This loop restarts whichever of the two
# is missing until each has actually completed, so the flagship-config
# measurements fire unattended the moment the tunnel returns.
#
# Safe to start while a sweep is already polling: it only (re)launches a stage
# when no process for it is running and its "done" marker is absent. It never
# kills anything.
set -u
LOG="${1:-/tmp/round3_sweep.log}"
OUT="${2:-/tmp/round3_sweep.jsonl}"
EXTRAS_LOG=/tmp/round3_extras.log
EXTRAS_OUT=/tmp/round3_extras.jsonl
cd "$(dirname "$0")/.."

while true; do
    if grep -q "sweep done" "$LOG" 2>/dev/null; then
        if grep -q "extras done" "$EXTRAS_LOG" 2>/dev/null; then
            if ! grep -q "levers done" /tmp/round3_levers.log 2>/dev/null; then
                echo "=== supervisor: starting lever A/Bs $(date +%H:%M:%S)" >> "$LOG"
                bash scripts/round3_levers.sh >> /tmp/round3_levers.log 2>&1
            fi
            if ! grep -q "trace done" /tmp/round3_trace.log 2>/dev/null; then
                echo "=== supervisor: starting trace capture $(date +%H:%M:%S)" >> "$LOG"
                bash scripts/round3_trace.sh >> /tmp/round3_trace.log 2>&1
            fi
            echo "=== supervisor: sweep + extras + levers + trace complete $(date +%H:%M:%S)" >> "$LOG"
            exit 0
        fi
        if ! ps -ef | grep round3_extras | grep -qv grep; then
            echo "=== supervisor: (re)starting extras $(date +%H:%M:%S)" >> "$EXTRAS_LOG"
            bash scripts/round3_extras.sh "$LOG" "$EXTRAS_OUT" >> "$EXTRAS_LOG" 2>&1
        fi
    elif ! ps -ef | grep round3_sweep.sh | grep -qv grep; then
        echo "=== supervisor: restarting sweep $(date +%H:%M:%S)" >> "$LOG"
        bash scripts/round3_sweep.sh "$OUT" >> "$LOG" 2>&1
    fi
    sleep 120
done
