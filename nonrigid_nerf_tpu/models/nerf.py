"""Canonical NeRF MLP.

Behavioral contract (reference: run_nerf_helpers.py:172-314): D=8 hidden
layers of width W=256 with a skip concat of the encoded input at layer 4;
either a single output head (W -> output_ch) or, with view directions, a
density head (W -> 1), a feature head (W -> W), one view-conditioned layer
(W + view_ch -> W/2) and an rgb head (W/2 -> 3). The time-conditioned
baseline concatenates the latent code to the MLP input and to every skip
(reference: run_nerf_helpers.py:273-282).

The ray bender is NOT part of this module (the reference stores it as a
1-tuple attribute precisely to hide it from parameters(),
run_nerf_helpers.py:213-215); here composition happens in engine.query.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.models.mlp import dense_init, dense_apply


def init_nerf_params(key, cfg, depth=None, width=None):
    """Initialize one canonical NeRF MLP (coarse or fine) from a ModelConfig."""
    D = depth if depth is not None else cfg.netdepth
    W = width if width is not None else cfg.netwidth
    input_ch = cfg.input_ch
    if cfg.time_conditioned_baseline:
        input_ch += cfg.ray_bending_latent_size

    keys = jax.random.split(key, D + 4)
    k = iter(keys)

    pts_layers = [dense_init(next(k), input_ch, W)]
    for i in range(D - 1):
        in_dim = W + input_ch if i in cfg.skips else W
        pts_layers.append(dense_init(next(k), in_dim, W))
    params = {"pts": pts_layers}

    if cfg.use_viewdirs:
        params["feature"] = dense_init(next(k), W, W)
        params["alpha"] = dense_init(next(k), W, 1)
        params["views"] = [dense_init(next(k), cfg.input_ch_views + W, W // 2)]
        params["rgb"] = dense_init(next(k), W // 2, 3)
    else:
        params["output"] = dense_init(next(k), W, cfg.output_ch)
    return params


def nerf_mlp_apply(params, cfg, embedded_pts, embedded_views=None,
                   latents=None):
    """Run the canonical MLP.

    embedded_pts:   (..., input_ch) positionally-encoded (bent) points.
    embedded_views: (..., input_ch_views) encoded view directions, required
                    iff cfg.use_viewdirs.
    latents:        (..., latent_size), required iff time_conditioned_baseline.

    Returns raw (..., 4): [rgb logits, density] (a vestigial 5th channel from
    the single-head variant is dropped here rather than at every consumer).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    h = embedded_pts
    if cfg.time_conditioned_baseline:
        h = jnp.concatenate([h, latents], axis=-1)
    mlp_input = h

    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(dense_apply(layer, h, dt))
        # reference applies the skip concat *after* activation of layer i
        # for i in skips (run_nerf_helpers.py:295-302)
        if i in cfg.skips:
            h = jnp.concatenate([mlp_input.astype(h.dtype), h], axis=-1)

    if cfg.use_viewdirs:
        alpha = dense_apply(params["alpha"], h, dt)
        feature = dense_apply(params["feature"], h, dt)
        hv = jnp.concatenate([feature, embedded_views.astype(feature.dtype)],
                             axis=-1)
        for layer in params["views"]:
            hv = jax.nn.relu(dense_apply(layer, hv, dt))
        rgb = dense_apply(params["rgb"], hv, dt)
        raw = jnp.concatenate([rgb, alpha], axis=-1)
    else:
        raw = dense_apply(params["output"], h, dt)[..., :4]
    # upcast low-precision compute back to f32; keep f64 (used by the
    # double-precision reference-parity harness) intact
    if raw.dtype == jnp.float64:
        return raw
    return raw.astype(jnp.float32)
