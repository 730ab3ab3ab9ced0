#!/usr/bin/env python
"""Probe a trained checkpoint's deformation field: offset magnitudes and
rigidity statistics over the scene volume, per timestep.

Quantifies scene-type behavior of the regularizers (reference analogs:
offsets/rigidity losses, train.py:219-242): on a rigid scene the masked
offsets must stay ~0 everywhere; on a large-motion scene the foreground
region must carry large offsets while the background stays small.

Usage:
  python tools/probe_offsets.py EXPERIMENT_DIR [--grid 16] [--out FILE]
      [--checkpoint logs/050000.npz]

--checkpoint probes a specific snapshot instead of the latest one, so the
deformation field's evolution can be tracked over a training run (the
50k-step snapshots train.py keeps).

Prints one JSON object; --out also writes it to a file.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment")
    ap.add_argument("--grid", type=int, default=16,
                    help="points per axis of the probe lattice")
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="probe this checkpoint file instead of the "
                         "experiment's latest (path, or a name relative "
                         "to EXPERIMENT_DIR)")
    args = ap.parse_args(argv)

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import jax.numpy as jnp
    from nonrigid_nerf_tpu import config as cfg_mod
    from nonrigid_nerf_tpu.checkpoints import (latest_checkpoint,
                                               load_checkpoint)
    from nonrigid_nerf_tpu.models.bending import bend_points

    logdir = os.path.join(args.experiment, "logs")
    if args.checkpoint:
        ckpt_path = args.checkpoint if os.path.exists(args.checkpoint) \
            else os.path.join(args.experiment, args.checkpoint)
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(f"no checkpoint at {ckpt_path}")
    else:
        ckpt_path = latest_checkpoint(logdir)
    if ckpt_path is None:
        raise FileNotFoundError(f"no checkpoint under {logdir}")
    step, params, _, extras = load_checkpoint(ckpt_path)
    train_args = cfg_mod.load_args(os.path.join(logdir, "args.txt"))
    cfg = cfg_mod.model_config_from_args(train_args)
    if not cfg.use_ray_bending or params.get("bender") is None:
        raise SystemExit("experiment has no ray-bending network")

    # probe lattice over the trained volume extent (falls back to the
    # near/far cube when the extent probe was skipped)
    sd = extras.get("scripts_dict", {})
    if "min_nerf_volume_point" in sd:
        lo = np.asarray(sd["min_nerf_volume_point"], np.float32)
        hi = np.asarray(sd["max_nerf_volume_point"], np.float32)
    else:
        far = float(sd.get("far", 6.0))
        lo, hi = np.full(3, -far, np.float32), np.full(3, far, np.float32)
    axes = [np.linspace(lo[i], hi[i], args.grid, dtype=np.float32)
            for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)

    latents = np.asarray(params["latents"])
    per_t = []
    all_offsets = []
    for t in range(latents.shape[0]):
        lat = jnp.broadcast_to(jnp.asarray(latents[t]),
                               (pts.shape[0], latents.shape[1]))
        _, det = bend_points(params["bender"], jnp.asarray(pts), lat)
        off = np.asarray(det.get("masked_offsets",
                                 det["unmasked_offsets"]))
        all_offsets.append(off)
        mag = np.linalg.norm(off, axis=-1)
        row = {"timestep": t,
               "mean_offset": float(mag.mean()),
               "p99_offset": float(np.percentile(mag, 99)),
               "max_offset": float(mag.max())}
        if "rigidity_mask" in det:
            rig = np.asarray(det["rigidity_mask"])[..., 0]
            row["mean_rigidity"] = float(rig.mean())
        per_t.append(row)

    # temporal motion: how much the bend of a point VARIES across
    # timesteps. A static offset merely re-parametrizes the canonical
    # frame; variation over t is what renders as scene motion, so on a
    # rigid scene this must be ~0 even where absolute offsets are not.
    stack = np.stack(all_offsets)                     # (T, N, 3)
    dev = np.linalg.norm(stack - stack.mean(axis=0, keepdims=True),
                         axis=-1)                     # (T, N)
    temporal = dev.mean(axis=0)                       # (N,)

    diag = float(np.linalg.norm(hi - lo))
    out = {
        "experiment": args.experiment, "step": int(step),
        "grid": args.grid, "extent_lo": lo.tolist(), "extent_hi": hi.tolist(),
        "extent_diagonal": diag,
        "mean_offset": float(np.mean([r["mean_offset"] for r in per_t])),
        "max_offset": float(np.max([r["max_offset"] for r in per_t])),
        "mean_offset_rel_diag":
            float(np.mean([r["mean_offset"] for r in per_t]) / diag),
        "mean_temporal_motion": float(temporal.mean()),
        "p99_temporal_motion": float(np.percentile(temporal, 99)),
        "max_temporal_motion": float(temporal.max()),
        "mean_temporal_motion_rel_diag": float(temporal.mean() / diag),
        "per_timestep": per_t,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
