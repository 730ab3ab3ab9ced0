"""Volume rendering: raw network outputs -> pixel values.

Behavioral contract (reference: train.py:724-789): alpha = 1 - exp(-relu(raw
density) * dist), visibility weights via the exclusive cumulative product of
transmittance, rgb/depth/acc/disparity maps, optional pre-activation density
noise, optional white background.

Everything is elementwise + small scans over the sample axis; XLA fuses the
whole function into the surrounding computation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb_map: jnp.ndarray           # (..., 3)
    disp_map: jnp.ndarray          # (...)
    acc_map: jnp.ndarray           # (...)
    opacity_alpha: jnp.ndarray     # (..., n_samples)
    visibility_weights: jnp.ndarray  # (..., n_samples)
    depth_map: jnp.ndarray         # (...)


def raw2outputs(raw, z_vals, rays_d, raw_noise_std: float = 0.0,
                white_bkgd: bool = False,
                noise_key: Optional[jax.Array] = None) -> RenderOutputs:
    """Composite raw (rgb, density) samples along rays.

    raw:    (..., n_samples, >=4) network outputs; [..., :3] rgb logits,
            [..., 3] density (any extra channels are ignored, matching the
            vestigial 5th output channel of the reference).
    z_vals: (..., n_samples) sample depths.
    rays_d: (..., 3) unnormalized ray directions (their norm converts depth
            deltas to metric distances).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    far_cap = jnp.full_like(z_vals[..., :1], 1e10)
    dists = jnp.concatenate([dists, far_cap], -1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    density = raw[..., 3]
    if raw_noise_std > 0.0:
        if noise_key is None:
            raise ValueError("raw_noise_std > 0 requires a noise_key")
        density = density + raw_noise_std * jax.random.normal(
            noise_key, density.shape, dtype=density.dtype)

    opacity_alpha = 1.0 - jnp.exp(-jax.nn.relu(density) * dists)

    # exclusive cumprod of transmittance: weights_i = alpha_i * prod_{j<i}(1-alpha_j)
    trans = jnp.cumprod(1.0 - opacity_alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    visibility_weights = opacity_alpha * trans

    rgb_map = jnp.sum(visibility_weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(visibility_weights * z_vals, axis=-1)
    acc_map = jnp.sum(visibility_weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-37))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, opacity_alpha,
                         visibility_weights, depth_map)
