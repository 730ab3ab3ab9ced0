#!/bin/bash
# Round-5 follow-ups, wave 2 (deadline-aware): fastE curve point, then the
# prefetch fix measured at scale, then the missing 150k occlusion probe.
# Each leg starts only if it can finish before the round deadline, so the
# chip is free for the driver's end-of-round bench.
set -u
cd /root/repo
Q=experiments_r5/r5_followups2.log
DEADLINE=1787173500   # ~21:15 UTC: last moment a leg may still be running
qlog() { echo "[followups2 $(date +%H:%M:%S)] $*" >> "$Q"; }
can_run() {  # est_seconds
  [ "$(date +%s)" -le "$((DEADLINE - $1))" ]
}

qlog "waiting for followups wave 1"
for i in $(seq 1 500); do
  grep -q "FOLLOWUPS DONE" experiments_r5/r5_followups.log 2>/dev/null && break
  sleep 15
done
qlog "gate passed"

if can_run 1900; then
  qlog "fastE (150k, decay 187.5k, lrate 7.5e-4)"
  tools/run_fast_recipe.sh fastE_150k_lr75 150000 187500 0.00075 float32
  qlog "fastE done"
else
  qlog "fastE SKIPPED (deadline)"
fi

if can_run 1700; then
  qlog "prefetch fix measured at scale (3k-step real scale300 run)"
  rm -rf experiments_r5/scale300_prefetch_check
  timeout 1800 python train.py --config configs/example_sequence.txt \
    --rootdir experiments_r5 --expname scale300_prefetch_check \
    --datadir data_r5/scale300 --factor 1 --N_iters 3000 \
    --offsets_loss_weight 3.0 --divergence_loss_weight 0.3 \
    --i_print 500 --i_img 0 --i_testset 1000000 --i_video 1000000 \
    --i_weights 1000000 --seed 0 --no_reload \
    > experiments_r5/scale300_prefetch_check.log 2>&1
  qlog "prefetch check done: $(grep -o '([0-9.]* it/s)' experiments_r5/scale300_prefetch_check.log | tail -1)"
else
  qlog "prefetch check SKIPPED (deadline)"
fi

if can_run 400; then
  qlog "missing 150k occlusion probe"
  timeout 350 python tools/probe_offsets.py experiments_r5/occlusion_200k \
    --checkpoint experiments_r5/occlusion_200k/logs/150000.npz \
    --out experiments_r5/occlusion_200k/offsets_150000.json \
    >> experiments_r5/occlusion_200k.log 2>&1
  qlog "probe done"
else
  qlog "probe SKIPPED (deadline)"
fi
qlog "FOLLOWUPS2 DONE"
