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
from nonrigid_nerf_tpu.ops.rays import get_rays


def determine_nerf_volume_extent(params, cfg: ModelConfig,
                                 rs: RenderSettings, poses, intrinsics,
                                 output_folder: str = None):
    """Returns (min_point, max_point) numpy arrays of shape (3,)."""
    rs = rs.test_mode()
    corners_o, corners_d = [], []
    for c2w, intrin in zip(poses, intrinsics):
        rays_o, rays_d = get_rays(jnp.asarray(c2w[:3, :4]), intrin)
        for yy, xx in ((0, 0), (-1, 0), (0, -1), (-1, -1)):
            corners_o.append(np.asarray(rays_o[yy, xx]))
            corners_d.append(np.asarray(rays_d[yy, xx]))
    rays_o = jnp.asarray(np.stack(corners_o))
    rays_d = jnp.asarray(np.stack(corners_d))
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
