"""Scene volume extent probe + camera visualization.

Renders the 4 corner rays of every camera, takes the min/max of all sample
points and camera positions, pads 10%, and writes a `cameras.obj` sanity
mesh (reference: run_nerf_helpers.py:918-1051, called from train.py:1485).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings
from nonrigid_nerf_tpu.engine.render import render_rays
from nonrigid_nerf_tpu.ops.rays import pixel_rays


def determine_nerf_volume_extent(params, cfg: ModelConfig,
                                 rs: RenderSettings, poses, intrinsics,
                                 output_folder: str = None):
    """Returns (min_point, max_point) numpy arrays of shape (3,).

    One batched pixel_rays call for all 4 corner rays of every camera —
    never materializes per-camera H x W ray grids and never fetches
    per-corner scalars (on a tunneled device, per-corner fetches cost a
    network roundtrip each: 86 cameras used to take ~8 minutes)."""
    rs = rs.test_mode()
    c2w, xs, ys, fx, fy, cx, cy = [], [], [], [], [], [], []
    # corner order (y, x) per camera matches the reference probe
    for pose, intrin in zip(poses, intrinsics):
        w, h = int(intrin["width"]), int(intrin["height"])
        for yy, xx in ((0, 0), (h - 1, 0), (0, w - 1), (h - 1, w - 1)):
            c2w.append(np.asarray(pose)[:3, :4])
            xs.append(xx)
            ys.append(yy)
            fx.append(intrin["focal_x"])
            fy.append(intrin["focal_y"])
            cx.append(intrin["center_x"])
            cy.append(intrin["center_y"])
    rays_o, rays_d = pixel_rays(
        jnp.asarray(np.stack(c2w), jnp.float32),
        jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32))
    latents = jnp.zeros((rays_o.shape[0],
                         intrinsics[0]["ray_bending_latent_size"]))

    out = render_rays(params, cfg, rs, rays_o, rays_d, latents, key=None,
                      detailed=True)
    pts = np.asarray(out["initial_input_pts"])       # (4N, S, 3)
    camera_positions = np.asarray(poses)[:, :3, 3]

    if output_folder is not None:
        _write_cameras_obj(os.path.join(output_folder, "cameras.obj"),
                           pts, camera_positions)

    critical = np.concatenate([pts.reshape(-1, 3), camera_positions], 0)
    min_point = critical.min(0)
    max_point = critical.max(0)
    center = (min_point + max_point) / 2.0
    min_point = center + (min_point - center) * 1.1
    max_point = center + (max_point - center) * 1.1
    return min_point, max_point


def _write_cameras_obj(path: str, corner_pts: np.ndarray,
                       camera_positions: np.ndarray) -> None:
    """Green near points, red corner-ray segments, blue camera markers."""
    eps = 1e-5
    begin = corner_pts[:, 0, :]
    end = corner_pts[:, -1, :]
    n = len(begin)
    m = len(camera_positions)
    with open(path, "w") as f:
        for x, y, z in begin:
            f.write(f"v {x} {y} {z} 0.0 1.0 0.0\n")
        for x, y, z in end:
            f.write(f"v {x} {y} {z} 1.0 0.0 0.0\n")
        for x, y, z in end:
            f.write(f"v {x + eps} {y} {z} 1.0 0.0 0.0\n")
        for x, y, z in camera_positions:
            f.write(f"v {x} {y} {z} 0.0 0.0 1.0\n")
        for x, y, z in camera_positions:
            f.write(f"v {x + eps} {y} {z} 0.0 0.0 1.0\n")
        for x, y, z in camera_positions:
            f.write(f"v {x} {y + eps} {z} 0.0 0.0 1.0\n")
        for i in range(1, n + 1):
            f.write(f"f {i} {i + n} {i + 2 * n}\n")
        off = 3 * n
        for i in range(1, m + 1):
            f.write(f"f {off + i} {off + i + m} {off + i + 2 * m}\n")
