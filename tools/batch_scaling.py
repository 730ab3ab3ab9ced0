#!/usr/bin/env python
"""Training throughput + MFU vs ray-batch size (N_rand).

Every quality/parity number so far runs the reference's N_rand=1024
schedule (reference configs/example_sequence.txt:22-28). This tool
measures the OTHER axis of the TPU promise: how much of the chip a single
step can use as the ray batch grows — the input to the batch-scaled
time-to-quality recipe (results/r5_fast_recipe/).

Uses the same contention-robust multi-window protocol as bench.py
(value = fastest window, steadiness = best/second-best ratio).

Usage:
  python tools/batch_scaling.py [--batches 1024,2048,4096,8192,16384]
      [--steps 200] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096,8192,16384")
    ap.add_argument("--steps", type=int, default=200,
                    help="steps per timed window (scaled down 2x for "
                         "batches >= 8192 to keep windows comparable)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    sys.path.insert(0, REPO)

    import jax
    from nonrigid_nerf_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache("~/.cache/nonrigid_nerf_tpu/xla")
    from nonrigid_nerf_tpu.config import (ModelConfig, RenderSettings,
                                          TrainConfig)
    from nonrigid_nerf_tpu.engine.train_state import create_train_state
    from nonrigid_nerf_tpu.engine.train_step import make_train_step
    from nonrigid_nerf_tpu.utils.flops import (device_bf16_peak_tflops,
                                               train_flops_per_ray)
    from bench import build_dataset, steady_windows

    ds = build_dataset()
    cfg = ModelConfig()
    rs = RenderSettings(near=ds.near, far=ds.far, raw_noise_std=1.0)
    peak = device_bf16_peak_tflops(jax.devices()[0])
    flops_per_ray = train_flops_per_ray(cfg, divergence_weight=3.0)
    key = jax.random.PRNGKey(1)

    rows = []
    for n_rand in [int(b) for b in args.batches.split(",")]:
        tc = TrainConfig(N_rand=n_rand, offsets_loss_weight=60.0,
                         divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=200000)
        state = create_train_state(jax.random.PRNGKey(0), cfg, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(cfg, tc, rs, has_test_split=False)
        st, metrics = step_fn(state, ds, key)
        float(metrics["loss"])
        for _ in range(5):
            st, metrics = step_fn(st, ds, key)
        float(metrics["loss"])
        box = {"st": st, "m": metrics}
        n_steps = args.steps if n_rand < 8192 else args.steps // 2

        def run_window():
            t0 = time.perf_counter()
            st, m = box["st"], box["m"]
            for _ in range(n_steps):
                st, m = step_fn(st, ds, key)
            float(m["loss"])
            box["st"], box["m"] = st, m
            return n_rand * n_steps / (time.perf_counter() - t0)

        rays_per_sec, steadiness, windows = steady_windows(run_window)
        tflops = rays_per_sec * flops_per_ray / 1e12
        row = {
            "N_rand": n_rand,
            "train_rays_per_sec": round(rays_per_sec, 1),
            "steps_per_sec": round(rays_per_sec / n_rand, 2),
            "model_tflops_per_sec": round(tflops, 2),
            "mfu_vs_bf16_peak": round(tflops / peak, 4) if peak else None,
            "steadiness": round(steadiness, 4),
            "windows": [round(w, 1) for w in windows],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = {"device": str(jax.devices()[0]),
              "bf16_peak_tflops": peak,
              "model_flops_per_train_ray": flops_per_ray,
              "config": "flagship (8x256 coarse+fine, bending+rigidity, "
                        "full NR-NeRF losses, example_sequence)",
              "rows": rows}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
