"""Ray generation from camera poses and per-camera intrinsics.

Camera convention (reference: run_nerf_helpers.py:588-624): pinhole camera
with x right, y up, z backwards; a pixel (x, y) maps to camera-space direction
[(x - cx)/fx, -(y - cy)/fy, -1], rotated to world space by the camera-to-world
rotation. Ray origins are the camera position.

TPU-first design difference: the reference precomputes a [N, H, W, ro+rd, 3]
host tensor for all images (reference: train.py:1498-1518). Here, rays are
pure functions of (pose, intrinsics, pixel coords), cheap enough to recompute
on device inside the jitted train step, so the device-resident dataset is just
the uint8 images plus tiny pose/intrinsics tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_rays(c2w, x, y, focal_x, focal_y, center_x, center_y):
    """Rays through arbitrary (possibly batched) pixel coordinates.

    Args:
      c2w: (..., 3, 4) camera-to-world matrices (broadcast against pixels).
      x, y: (...,) pixel coordinates (x = column, y = row).
      focal_*, center_*: scalars or (...,) per-pixel intrinsics.

    Returns:
      rays_o, rays_d: (..., 3) world-space origins and (unnormalized)
      directions.
    """
    dirs = jnp.stack(
        [(x - center_x) / focal_x,
         -(y - center_y) / focal_y,
         -jnp.ones_like(x)], axis=-1)                     # (..., 3)
    # world dir = R @ dir_cam; tiny 3x3 contraction, keep it full precision
    # even on TPU (default matmul precision there is bf16)
    rays_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], dirs,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(c2w, intrin):
    """Full-image ray grid: returns (H, W, 3) origins and directions.

    `intrin` is a dict with height/width/focal_x/focal_y/center_x/center_y
    (matching the reference's intrinsics schema, train.py:1270-1322).
    """
    H, W = int(intrin["height"]), int(intrin["width"])
    x = jnp.arange(W, dtype=jnp.float32)
    y = jnp.arange(H, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")            # (H, W)
    return pixel_rays(
        c2w, xx, yy,
        float(intrin["focal_x"]), float(intrin["focal_y"]),
        float(intrin["center_x"]), float(intrin["center_y"]))


def ndc_rays(H, W, focal_x, focal_y, near, rays_o, rays_d):
    """Shift rays to the near plane and project into NDC space.

    Present for API parity; the reference keeps NDC disabled
    (reference: train.py:384-387,714).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal_x)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal_y)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal_x)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal_y)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
