#!/usr/bin/env bash
# Full classification ablation matrix (CinC PCG / PCG+ECG, vest, synthetic schedules).
# Usage: scripts/run_ablations.sh CINC_DIR CINC_CSV VEST_DIR VEST_CSV RESULTS_JSON
set -euo pipefail

CINC_DIR=${1:?cinc dir}
CINC_CSV=${2:?cinc csv}
VEST_DIR=${3:?vest dir}
VEST_CSV=${4:?vest csv}
RESULTS=${5:-results/ablations.json}

for FOLD in 1 2 3 4 5; do
  # single-channel PCG: pretrained vs random init, with/without augmentation
  for INIT in "" "--random-init"; do
    for AUG in "--augment" "--no-augment"; do
      w2vhs-tpu classify-cinc --data-dir "$CINC_DIR" --csv "$CINC_CSV" --mode pcg \
        --fs 4125 --fold "$FOLD" $INIT $AUG --results-json "$RESULTS"
    done
  done
  # ECG branch + two-branch fusion
  w2vhs-tpu classify-cinc --data-dir "$CINC_DIR" --csv "$CINC_CSV" --mode ecg \
    --fs 4125 --fold "$FOLD" --results-json "$RESULTS"
  w2vhs-tpu classify-cinc --data-dir "$CINC_DIR" --csv "$CINC_CSV" --mode pcg_ecg \
    --fs 4125 --fold "$FOLD" --results-json "$RESULTS"
  # legacy reference regime
  w2vhs-tpu classify-cinc --data-dir "$CINC_DIR" --csv "$CINC_CSV" --mode pcg \
    --fs 4125 --fold "$FOLD" --reference-train-rnn --results-json "$RESULTS"

  # vest: lora / frozen / contrastive-focal
  w2vhs-tpu classify-vest --data-dir "$VEST_DIR" --csv "$VEST_CSV" --fold "$FOLD" \
    --results-json "$RESULTS"
  w2vhs-tpu classify-vest --data-dir "$VEST_DIR" --csv "$VEST_CSV" --fold "$FOLD" \
    --freeze-encoder --results-json "$RESULTS"
  w2vhs-tpu classify-vest --data-dir "$VEST_DIR" --csv "$VEST_CSV" --fold "$FOLD" \
    --loss contrastive-focal --results-json "$RESULTS"
done

# synthetic-augmentation schedules
for SCHED in configs/schedule_diffwave_only.json configs/schedule_wavegrad_only.json \
             configs/schedule_paper_training_a.json; do
  w2vhs-tpu classify-synthetic --schedule "$SCHED" --results-json "$RESULTS"
done

w2vhs-tpu summarize "$RESULTS" --group-by mode,random_init,augment
