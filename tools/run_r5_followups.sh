#!/bin/bash
# Round-5 follow-up chip work, chained behind tools/run_r5_queue.sh:
#   1. clean-window scale bisect (exclusive chip: fused vs split step at
#      the 86- and 900-frame stack sizes — the 2.8x regression diagnosis)
#   2. fastB: LR-tuned compressed schedule (does a hotter LR rescue the
#      2x-compressed schedule's -0.93 dB?)
#   3. fastC: 150k-step point to complete the steps-vs-quality curve
set -u
cd /root/repo
Q=experiments_r5/r5_followups.log
qlog() { echo "[followups $(date +%H:%M:%S)] $*" >> "$Q"; }

qlog "waiting for r5 queue"
for i in $(seq 1 400); do
  grep -q "QUEUE DONE" experiments_r5/r5_queue.log 2>/dev/null && break
  sleep 15
done
qlog "queue gate passed"

qlog "clean-window scale bisect"
timeout 1800 python tools/scale_bisect.py > experiments_r5/bisect_clean.log 2>&1
qlog "bisect done: $(grep -c 'STEP' experiments_r5/bisect_clean.log) readings"

qlog "fastB (100k, decay 125k, lrate 7.5e-4)"
tools/run_fast_recipe.sh fastB_lr75 100000 125000 0.00075 float32
qlog "fastB done: $(tail -1 experiments_r5/fastB_lr75.log)"

qlog "fastC (150k, decay 187.5k, lrate 5e-4)"
tools/run_fast_recipe.sh fastC_150k 150000 187500 0.0005 float32
qlog "fastC done: $(tail -1 experiments_r5/fastC_150k.log)"
qlog "FOLLOWUPS DONE"
