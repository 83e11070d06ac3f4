#!/bin/bash
# Stage 4 of the round-3 unattended measurement chain: full-step A/Bs for the
# gated kernel levers added while the relay was down. Each knob defaults OFF in
# the committed tree; a winning A/B here is the evidence to flip the default.
#
#   W2VHS_ATTN_DN=1   defer softmax normalisation to the [H,T,d] output
#                     (removes a full [hb,Tp,Tp] VPU divide in fwd AND bwd recompute)
#   W2VHS_FFN_TANH=1  tanh-approximate GELU inside the fused FFN activation kernel
#                     (~708M GELUs/step; the same switch won ~45 w/s on the conv cascade)
#
# Usage: bash scripts/round3_levers.sh [outfile]
set -u
OUT="${1:-/tmp/round3_levers.jsonl}"
cd "$(dirname "$0")/.."
: > "$OUT"

run_ab () {
    local tag="$1"; shift
    echo "=== lever=$tag $(date +%H:%M:%S)"
    ( export "$@" _IGNORE=0; timeout 2400 python bench.py --mode=train 2>&1 \
        | grep -v -e WARNING -e Warning | tail -1 ) \
        | sed "s/^{/{\"lever\": \"$tag\", /" | tee -a "$OUT"
}

run_ab attn_dn W2VHS_ATTN_DN=1
run_ab ffn_tanh W2VHS_FFN_TANH=1
run_ab attn_dn+ffn_tanh W2VHS_ATTN_DN=1 W2VHS_FFN_TANH=1
# combined with the queued head-block knob, in case hb=12 alone also won
run_ab all+hb12 W2VHS_ATTN_DN=1 W2VHS_FFN_TANH=1 W2VHS_ATTN_VMEM_MB=16
echo "=== levers done $(date +%H:%M:%S)"
