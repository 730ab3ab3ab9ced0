#!/usr/bin/env python
"""Generate a synthetic multi-camera dynamic dataset in the reference's
multi-view layout (calibration.json + calibration_averaged_camera_view.json
+ image_to_camera_id_and_timestep.json; schema: reference README.md:177-215).

The scene is ray-traced known geometry, so reconstruction quality is
meaningful: a nonrigidly moving/pulsating sphere (the deforming foreground),
a static sphere (parallax), and a static checkered back plane (rigid
background) under Lambertian shading. Cameras differ in position,
orientation AND intrinsics (focal/center), exercising the per-view
intrinsics path (reference: train.py:1270-1322).

Usage:
  python tools/make_multiview_dataset.py --out /path/ds [--views 3]
      [--timesteps 30] [--height 384] [--width 512]
"""

import argparse
import json
import os

import numpy as np


def look_at(pos, target, up=(0.0, 1.0, 0.0)):
    """c2w rotation with NeRF's camera frame (columns right/up/back)."""
    pos = np.asarray(pos, np.float64)
    back = pos - np.asarray(target, np.float64)
    back /= np.linalg.norm(back)
    right = np.cross(np.asarray(up, np.float64), back)
    right /= np.linalg.norm(right)
    upv = np.cross(back, right)
    return np.stack([right, upv, back], axis=1)


def scene_at(t_frac, scene="default"):
    """Sphere list [(center, radius, rgb)] + plane config at time t in [0,1].

    Scene variants for robustness coverage:
      default      — the r3 flagship scene: moving/pulsating foreground
                     sphere + static sphere + checkered plane.
      large_motion — the foreground sphere sweeps ~2x the default amplitude
                     with a stronger radius pulse (stress: big offsets).
      occlusion    — the moving sphere crosses IN DEPTH through the static
                     sphere's line of sight, occluding and disoccluding it
                     (stress: visibility changes the offsets loss weights).
      rigid        — NOTHING moves; a correct model must keep offsets ~0
                     everywhere (the rigidity field has nothing to gate).
    """
    static = (np.array([-1.1, 0.35, -0.6]), 0.4, np.array([0.2, 0.5, 0.9]))
    if scene == "default":
        moving = (np.array([0.7 * np.sin(2 * np.pi * t_frac),
                            0.25 * np.sin(4 * np.pi * t_frac + 1.0),
                            0.0]),
                  0.55 + 0.12 * np.sin(4 * np.pi * t_frac),
                  np.array([0.9, 0.35, 0.2]))
    elif scene == "large_motion":
        moving = (np.array([1.4 * np.sin(2 * np.pi * t_frac),
                            0.5 * np.sin(4 * np.pi * t_frac + 1.0),
                            0.3 * np.sin(2 * np.pi * t_frac + 0.5)]),
                  0.5 + 0.2 * np.sin(4 * np.pi * t_frac),
                  np.array([0.9, 0.35, 0.2]))
    elif scene == "occlusion":
        # sweeps from the right across the static sphere's position and
        # IN FRONT of it in depth (z from -1.3 behind to +0.4 in front)
        moving = (np.array([-1.1 + 1.6 * np.cos(2 * np.pi * t_frac),
                            0.35,
                            -0.45 + 0.85 * np.sin(2 * np.pi * t_frac)]),
                  0.45,
                  np.array([0.9, 0.35, 0.2]))
    elif scene == "rigid":
        moving = (np.array([0.5, 0.1, 0.0]), 0.55,
                  np.array([0.9, 0.35, 0.2]))
    else:
        raise ValueError(f"unknown scene {scene!r}")
    return [moving, static]


LIGHT = np.array([0.5, 0.8, 0.6]) / np.linalg.norm([0.5, 0.8, 0.6])
PLANE_Z = -1.6


def render_frame(R, pos, H, W, fx, fy, cx, cy, t_frac, scene="default"):
    """Vectorized ray trace of the scene from one camera."""
    x, y = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    d_cam = np.stack([(x - cx) / fx, -(y - cy) / fy, -np.ones_like(x)], -1)
    d = d_cam @ R.T                                     # (H, W, 3) world
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pos, d.shape)

    t_hit = np.full((H, W), np.inf)
    color = np.zeros((H, W, 3))

    for center, radius, rgb in scene_at(t_frac, scene):
        oc = o - center
        b = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - radius * radius
        disc = b * b - c
        hit = disc > 0
        t0 = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= (t0 > 1e-6) & (t0 < t_hit)
        n = (o + t0[..., None] * d - center) / radius
        shade = 0.15 + 0.85 * np.clip(np.sum(n * LIGHT, -1), 0.0, None)
        color = np.where(hit[..., None], rgb * shade[..., None], color)
        t_hit = np.where(hit, t0, t_hit)

    # back plane z = PLANE_Z with a checker texture
    tz = (PLANE_Z - o[..., 2]) / np.where(np.abs(d[..., 2]) < 1e-9, 1e-9,
                                          d[..., 2])
    hit = (tz > 1e-6) & (tz < t_hit)
    p = o + tz[..., None] * d
    checker = ((np.floor(p[..., 0] / 0.5) + np.floor(p[..., 1] / 0.5))
               % 2).astype(bool)
    base = np.where(checker[..., None], np.array([0.75, 0.75, 0.7]),
                    np.array([0.35, 0.4, 0.45]))
    grad = 0.75 + 0.25 * np.clip((p[..., 1] + 2.0) / 4.0, 0, 1)[..., None]
    color = np.where(hit[..., None], base * grad, color)
    t_hit = np.where(hit, tz, t_hit)

    color = np.where(np.isinf(t_hit)[..., None],
                     np.array([0.05, 0.05, 0.08]), color)
    return np.clip(color, 0.0, 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--timesteps", type=int, default=30)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--scene", default="default",
                    choices=["default", "large_motion", "occlusion",
                             "rigid"])
    ap.add_argument("--write_downsampled", type=int, default=0,
                    metavar="FACTOR",
                    help="also write a pre-downsampled images_{FACTOR}/ "
                         "folder (the LLFF images_{factor} convention the "
                         "loader prefers at --factor FACTOR)")
    args = ap.parse_args(argv)

    import imageio.v2 as imageio
    H, W = args.height, args.width
    imgdir = os.path.join(args.out, "images")
    os.makedirs(imgdir, exist_ok=True)

    calibration = {"min_bound": 2.2, "max_bound": 7.5}
    avg_calibration = {}
    cams = []
    for v in range(args.views):
        a = (v - (args.views - 1) / 2.0)
        pos = np.array([1.1 * a, 0.35 * a + 0.2, 4.2 + 0.25 * abs(a)])
        R = look_at(pos, (0.0, 0.0, -0.3))
        fx = 1.15 * W + 28.0 * v
        fy = 1.15 * W + 12.0 * v
        cx = W / 2.0 + 6.0 * a
        cy = H / 2.0 - 4.0 * a
        view = f"cam{v}"
        calibration[view] = {"rotation": R.tolist(),
                             "translation": pos.tolist()}
        avg_calibration[view] = {"height": H, "width": W,
                                 "focal_x": fx, "focal_y": fy,
                                 "center_x": cx, "center_y": cy}
        cams.append((R, pos, fx, fy, cx, cy))

    down = args.write_downsampled
    if down:
        downdir = os.path.join(args.out, f"images_{down}")
        os.makedirs(downdir, exist_ok=True)
        assert H % down == 0 and W % down == 0, (H, W, down)

    mapping = {}
    idx = 0
    for t in range(args.timesteps):
        t_frac = t / max(args.timesteps - 1, 1)
        for v, (R, pos, fx, fy, cx, cy) in enumerate(cams):
            img = render_frame(R, pos, H, W, fx, fy, cx, cy, t_frac,
                               args.scene)
            name = f"img{idx:05d}.png"
            imageio.imwrite(os.path.join(imgdir, name),
                            (255 * img).astype(np.uint8))
            if down:
                small = img.reshape(H // down, down, W // down, down,
                                    3).mean(axis=(1, 3))
                imageio.imwrite(os.path.join(downdir, name),
                                (255 * small).astype(np.uint8))
            mapping[name] = [f"cam{v}", t]
            idx += 1
        print(f"timestep {t + 1}/{args.timesteps}", flush=True)

    with open(os.path.join(args.out, "calibration.json"), "w") as f:
        json.dump(calibration, f, indent=2)
    with open(os.path.join(args.out,
                           "calibration_averaged_camera_view.json"),
              "w") as f:
        json.dump(avg_calibration, f, indent=2)
    with open(os.path.join(args.out,
                           "image_to_camera_id_and_timestep.json"),
              "w") as f:
        json.dump(mapping, f, indent=2)
    print(f"wrote {idx} images ({args.views} views x {args.timesteps} "
          f"timesteps) to {args.out}")


if __name__ == "__main__":
    main()
