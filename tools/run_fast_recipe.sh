#!/bin/bash
# Compressed-schedule "fast recipe" pipeline (results/r5_fast_recipe).
# Trains a 2x-compressed flagship schedule (100k iters, decay 125k) at the
# measured single-chip throughput optimum N_rand=1024, then scores it with
# the reference protocol (free_viewpoint_rendering.py input_reconstruction).
# Runs detached; auto-resumes from the latest checkpoint after any crash.
set -u
cd /root/repo
EXP=${1:-fastA_100k}
ITERS=${2:-100000}
DECAY=${3:-125000}
LRATE=${4:-0.0005}
DTYPE=${5:-float32}
LOG=experiments_r5/${EXP}.log
mkdir -p experiments_r5
echo "=== fast-recipe pipeline $EXP iters=$ITERS decay=$DECAY lrate=$LRATE dtype=$DTYPE $(date) ===" >> "$LOG"
for attempt in $(seq 1 40); do
  if grep -q "training done" "$LOG" 2>/dev/null; then break; fi
  echo "--- train attempt $attempt $(date) ---" >> "$LOG"
  timeout 3000 python train.py --config configs/example_sequence.txt \
    --rootdir experiments_r5 --expname "$EXP" \
    --N_iters "$ITERS" --lrate_decay "$DECAY" \
    --lrate "$LRATE" --compute_dtype "$DTYPE" \
    --i_weights 10000 --i_print 2000 --i_img 0 \
    --i_testset 1000000 --i_video 1000000 --seed 0 \
    >> "$LOG" 2>&1
  sleep 3
done
if ! grep -q "training done" "$LOG"; then
  echo "PIPELINE FAILED: training never completed" >> "$LOG"
  exit 1
fi
echo "--- eval $(date) ---" >> "$LOG"
for attempt in 1 2 3; do
  timeout 3000 python free_viewpoint_rendering.py \
    --input "experiments_r5/$EXP" \
    --deformations train --camera_path input_reconstruction \
    >> "$LOG" 2>&1 && break
  sleep 3
done
echo "PIPELINE DONE $(date)" >> "$LOG"
