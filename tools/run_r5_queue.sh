#!/bin/bash
# Round-5 chip queue (runs detached, survives session restarts):
#   A. wait for the fast-recipe pipeline (tools/run_fast_recipe.sh) to finish
#   B. scale-envelope workload: 3 views x 300 timesteps @ 1280x720
#      (the top of the reference's recommended 100-300 frame range,
#      /root/reference/README.md:73) trained 100k steps, then scored
#   C. hard-dynamics workload: the occlusion scene at the FULL 200k
#      schedule with the multi-view-tuned regularizers, then scored
#      (input_reconstruction), background-stability probed (fixed path),
#      and the deformation field probed at every kept checkpoint
# Each train leg auto-resumes from the latest checkpoint after a crash.
set -u
cd /root/repo
Q=experiments_r5/r5_queue.log
mkdir -p experiments_r5
qlog() { echo "[queue $(date +%H:%M:%S)] $*" >> "$Q"; }

train_until_done() {  # expname, log, then train.py args...
  local exp="$1" log="$2"; shift 2
  for attempt in $(seq 1 60); do
    if grep -q "training done" "$log" 2>/dev/null; then return 0; fi
    qlog "train $exp attempt $attempt"
    timeout 4000 python train.py --rootdir experiments_r5 --expname "$exp" \
      --seed 0 --i_print 2000 --i_img 0 --i_testset 1000000 \
      --i_video 1000000 --metrics_file "$@" >> "$log" 2>&1
    sleep 3
  done
  qlog "train $exp FAILED (never completed)"; return 1
}

fvr() {  # args...
  for attempt in 1 2 3; do
    timeout 4000 python free_viewpoint_rendering.py "$@" && return 0
    sleep 3
  done
  return 1
}

# ---- A. wait for the fast-recipe pipeline --------------------------------
qlog "waiting for fastA pipeline"
for i in $(seq 1 240); do
  grep -q "PIPELINE DONE\|PIPELINE FAILED" experiments_r5/fastA_100k.log \
    2>/dev/null && break
  sleep 15
done
qlog "fastA gate passed: $(tail -1 experiments_r5/fastA_100k.log 2>/dev/null)"

# ---- B. scale envelope: 300 timesteps @ 720p -----------------------------
qlog "phase B: scale300 train"
train_until_done scale300_100k experiments_r5/scale300_100k.log \
  --config configs/example_sequence.txt --datadir data_r5/scale300 \
  --factor 1 --N_iters 100000 --lrate_decay 250000 \
  --offsets_loss_weight 3.0 --divergence_loss_weight 0.3 \
  --i_weights 25000
qlog "phase B: scale300 eval (input_reconstruction, every 30th of 900 views)"
fvr --input experiments_r5/scale300_100k --deformations train \
  --camera_path input_reconstruction --view_stride 30 \
  >> experiments_r5/scale300_100k.log 2>&1
qlog "phase B done"

# ---- C. hard dynamics: occlusion at the full 200k schedule ---------------
qlog "phase C: occlusion_200k train"
train_until_done occlusion_200k experiments_r5/occlusion_200k.log \
  --config configs/example_sequence.txt --datadir data_r5/occlusion \
  --factor 1 --N_iters 200000 --lrate_decay 250000 \
  --offsets_loss_weight 3.0 --divergence_loss_weight 0.3 \
  --i_weights 25000
qlog "phase C: occlusion eval (scores)"
fvr --input experiments_r5/occlusion_200k --deformations train \
  --camera_path input_reconstruction >> experiments_r5/occlusion_200k.log 2>&1
qlog "phase C: occlusion background stability (fixed path)"
fvr --input experiments_r5/occlusion_200k --deformations train \
  --camera_path fixed --fixed_view 0 \
  >> experiments_r5/occlusion_200k.log 2>&1
qlog "phase C: deformation-field probes over training"
for ck in experiments_r5/occlusion_200k/logs/[0-9]*.npz; do
  [ -e "$ck" ] || continue
  step=$(basename "$ck" .npz)
  timeout 1200 python tools/probe_offsets.py experiments_r5/occlusion_200k \
    --checkpoint "$ck" \
    --out "experiments_r5/occlusion_200k/offsets_${step}.json" \
    >> experiments_r5/occlusion_200k.log 2>&1
done
timeout 1200 python tools/probe_offsets.py experiments_r5/occlusion_200k \
  --out experiments_r5/occlusion_200k/offsets_final.json \
  >> experiments_r5/occlusion_200k.log 2>&1
qlog "QUEUE DONE"
