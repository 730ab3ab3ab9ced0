"""Ray-bending deformation field + rigidity network.

Behavioral contract (reference: run_nerf_helpers.py:388-584):

- bending MLP ("simple_neural"): depth 5, hidden 64, input = raw xyz (3) +
  per-timestep latent (32), output = 3 offsets, ReLU activations, NO final
  bias, final layer zero-initialized so training starts from straight rays.
- rigidity MLP: depth 3, hidden 32, input = raw xyz only, output 1; mask =
  (tanh(h) + 1)/2 (1 = nonrigid, 0 = rigid); zero-init final layer (with
  bias) so the mask starts at 0.5 everywhere.
- bent point = raw_xyz + rigidity_mask * offsets (skip connection).
- test-time edit hooks: rigidity cutoff (forced background stabilization) and
  offset scaling (motion exaggeration/dampening).

Design note: unlike the reference (an nn.Module whose forward mixes bending,
edits, and the positional encoding), these are pure functions over
(..., 3)-shaped points; the caller composes encoding/edits explicitly, which
keeps jvp-based regularizers (divergence loss, exact viewdirs) trivial.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.models.mlp import dense_init, dense_apply


def init_bending_params(key, cfg):
    """Initialize bending + rigidity networks from a ModelConfig."""
    if not cfg.use_ray_bending:
        return None
    keys = jax.random.split(key, cfg.bending_depth + cfg.rigidity_depth)
    k = iter(keys)

    siren = getattr(cfg, "bending_activation", "relu") == "sin"
    layers = []
    in_dim = 3 + cfg.ray_bending_latent_size
    for i in range(cfg.bending_depth - 1):
        if siren:
            hidden_init = "siren_first" if i == 0 else "siren"
        else:
            hidden_init = "kaiming_relu"
        layers.append(dense_init(next(k), in_dim, cfg.bending_width,
                                 init=hidden_init))
        in_dim = cfg.bending_width
    layers.append(dense_init(next(k), in_dim, 3, init="zeros", use_bias=False))

    params = {"bend": layers}

    if cfg.use_rigidity_network:
        rlayers = []
        in_dim = 3
        for _ in range(cfg.rigidity_depth - 1):
            rlayers.append(dense_init(next(k), in_dim, cfg.rigidity_width,
                                      init="kaiming_relu"))
            in_dim = cfg.rigidity_width
        rlayers.append(dense_init(next(k), in_dim, 1, init="zeros",
                                  use_bias=True))
        params["rigidity"] = rlayers
    return params


def _mlp_chain(layers, x, compute_dtype=None, activation="relu"):
    h = x
    for i, layer in enumerate(layers[:-1]):
        h = dense_apply(layer, h, compute_dtype)
        if activation == "sin":
            # SIREN: scale the first layer's pre-activation by 30
            # (reference: run_nerf_helpers.py:528-530)
            if i == 0:
                h = h * 30.0
            h = jnp.sin(h)
        else:
            h = jax.nn.relu(h)
    return dense_apply(layers[-1], h, compute_dtype)


def unmasked_offsets_fn(params, pts, latents, compute_dtype=None,
                        activation="relu"):
    """Raw (pre-rigidity) offsets for points (..., 3) with latents (..., L)."""
    h = jnp.concatenate([pts, latents], axis=-1)
    return _mlp_chain(params["bend"], h, compute_dtype,
                      activation).astype(pts.dtype)


def rigidity_mask_fn(params, pts, compute_dtype=None):
    """Rigidity mask in [0, 1] for points (..., 3); (..., 1)-shaped."""
    h = _mlp_chain(params["rigidity"], pts, compute_dtype)
    return ((jnp.tanh(h) + 1.0) * 0.5).astype(pts.dtype)


def bend_points(params, pts, latents, compute_dtype=None,
                rigidity_test_time_cutoff: Optional[float] = None,
                test_time_scaling: Optional[float] = None,
                activation: str = "relu"):
    """Apply the deformation field: returns (bent_pts, details dict).

    details carries the per-point internals the losses need
    (reference: the `details` dict threading, run_nerf_helpers.py:507-584):
    unmasked_offsets, rigidity_mask, masked_offsets.
    """
    details = {}
    unmasked = unmasked_offsets_fn(params, pts, latents, compute_dtype,
                                   activation)
    details["unmasked_offsets"] = unmasked

    if "rigidity" in params:
        mask = rigidity_mask_fn(params, pts, compute_dtype)
        if rigidity_test_time_cutoff is not None:
            mask = jnp.where(mask <= rigidity_test_time_cutoff,
                             jnp.zeros_like(mask), mask)
        offsets = mask * unmasked
        details["rigidity_mask"] = mask
        if test_time_scaling is not None:
            offsets = offsets * test_time_scaling
        details["masked_offsets"] = offsets
    else:
        offsets = unmasked
        if test_time_scaling is not None:
            offsets = offsets * test_time_scaling

    return pts + offsets, details
