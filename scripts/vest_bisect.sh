#!/bin/bash
# Round-4 bisect of the round-3 vest TPU worker crash (docs/artifacts/r3/chain.log:
# 6/6 "kernel fault" on the full vest train step; every other mode clean).
# Each case runs bench.py --mode=vest in a fresh process with one knob flipped.
# Usage: bash scripts/vest_bisect.sh [logdir]
set -u
LOG=${1:-/tmp/r4}
mkdir -p "$LOG"
cd /root/repo

run_case() {
  local name="$1"; shift
  echo "=== case=$name $(date +%H:%M:%S) env: $*" | tee -a "$LOG/bisect.log"
  env "$@" timeout 1800 python bench.py --mode=vest > "$LOG/vest_$name.out" 2>&1
  local rc=$?
  echo "--- case=$name rc=$rc" | tee -a "$LOG/bisect.log"
  tail -3 "$LOG/vest_$name.out" | tee -a "$LOG/bisect.log"
  sleep 90   # let the TPU worker recover if it crashed
}

# 1. Stale-AOT hypothesis: force fresh compiles, all kernels on.
run_case aot0 W2VHS_AOT=0
# 2. flash_kv hypothesis: exact chunked-scan attention, sinc kernel still on.
run_case noflashkv W2VHS_NO_FLASHKV=1
# 3. sinc-kernel hypothesis: flash_kv on, sinc -> XLA reference.
run_case nosinc W2VHS_NO_SINC=1
# 4. all-Pallas-off control: if this still crashes, the fault is outside both kernels.
run_case nokernels W2VHS_NO_FLASHKV=1 W2VHS_NO_SINC=1
# 5. HBM-pressure hypothesis: quarter batch, all kernels on.
run_case b4 W2VHS_VEST_BATCH=4
echo "=== bisect done $(date +%H:%M:%S)" | tee -a "$LOG/bisect.log"
