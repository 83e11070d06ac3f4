#!/usr/bin/env bash
# Train both diffusion generators and synthesize augmentation datasets.
# Usage: scripts/run_generators.sh DATA_DIR SPLIT_CSV OUT_ROOT [SEGMENT_DIR]
set -euo pipefail

DATA_DIR=${1:?data dir}
CSV=${2:?split csv}
OUT=${3:?output root}
SEG=${4:-}

SEG_FLAG=()
[ -n "$SEG" ] && SEG_FLAG=(--segment-dir "$SEG")

for MODEL in diffwave wavegrad; do
  w2vhs-tpu gen-train --model "$MODEL" --data-dir "$DATA_DIR" --csv "$CSV" \
    --output-dir "$OUT/$MODEL" --epochs 100 "${SEG_FLAG[@]}"
  w2vhs-tpu gen-sample --model "$MODEL" --weights "$OUT/$MODEL/weights.msgpack" \
    --data-dir "$DATA_DIR" --csv "$CSV" --output-dir "$OUT/generated-$MODEL" --per-item 4
done
