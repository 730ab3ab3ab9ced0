"""The point-query pipeline: sample points -> (bend) -> encode -> canonical MLP.

This is the inner hot loop of NR-NeRF (reference: NeRF.forward,
run_nerf_helpers.py:240-314, driven through run_network, train.py:57-105).
The reference streams flattened points through the network in `netchunk`
pieces to bound GPU memory; on TPU the whole (rays, samples) block is one
fused XLA computation (the caller bounds memory by choosing the ray-block
size), and keeping the (rays, samples) structure makes the
finite-difference view directions a simple shifted subtraction instead of
the reference's netchunk-divisibility contortions (train.py:584-592).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.config import EditConfig, ModelConfig
from nonrigid_nerf_tpu.models.bending import bend_points
from nonrigid_nerf_tpu.models.nerf import nerf_mlp_apply
from nonrigid_nerf_tpu.ops.embedding import fourier_embed


def _embed_pts(cfg: ModelConfig, pts):
    if cfg.i_embed == -1:
        return pts
    return fourier_embed(pts, cfg.multires)


def _embed_views(cfg: ModelConfig, dirs):
    if cfg.i_embed == -1:
        return dirs
    return fourier_embed(dirs, cfg.multires_views)


def _finite_difference_viewdirs(bent_pts, eps: float = 1e-6):
    """Per-sample view directions of the *bent* ray: normalized backward
    differences between consecutive bent samples, first sample duplicated
    (reference: run_nerf_helpers.py:316-369, "backward" branch).

    Uses safe_norm: the fine pass sorts the union of coarse and importance
    depths, which can contain (near-)duplicates -> zero-length differences,
    where jnp.linalg.norm has a NaN gradient (PyTorch special-cases this)."""
    from nonrigid_nerf_tpu.ops.math import safe_norm
    diffs = bent_pts[..., 1:, :] - bent_pts[..., :-1, :]     # (R, S-1, 3)
    norm = safe_norm(diffs, axis=-1, keepdims=True)
    diffs = diffs / (norm + eps)
    return jnp.concatenate([diffs[..., :1, :], diffs], axis=-2)  # (R, S, 3)


def _edits_active(edit: EditConfig) -> bool:
    return (edit.rigidity_test_time_cutoff is not None
            or edit.test_time_scaling is not None
            or edit.nonrigid_object_removal_threshold is not None
            or edit.render_canonical)


def _use_fused_kernel(cfg: ModelConfig, edit: EditConfig) -> bool:
    from nonrigid_nerf_tpu.ops.pallas.fused_query import supports_fused_query
    if cfg.fused_kernel == "off":
        return False
    if not supports_fused_query(cfg) or _edits_active(edit):
        if cfg.fused_kernel == "on":
            raise ValueError(
                "fused_kernel='on' but the configuration (architecture, "
                "viewdirs, or scene edits) is outside the kernel's support; "
                "use fused_kernel='auto'")
        return False
    if cfg.fused_kernel == "on":
        return True
    return jax.default_backend() == "tpu"


def _fused_query_points(params, cfg: ModelConfig, pts, latents,
                        network: str, detailed: bool):
    """query_points via the Pallas MLP kernel (ops/pallas/fused_query).

    Hybrid layout, chosen by measurement: the bend/rigidity/encoding stage
    runs in XLA (small-lane ops cost full 128-lane vectors inside Mosaic,
    making a hand kernel SLOWER there), while the canonical 8x256 MLP — the
    FLOP and activation-traffic bulk — runs as the Pallas kernel with
    VMEM-resident weights and an in-VMEM recompute backward.
    """
    from nonrigid_nerf_tpu.ops.pallas.fused_query import (
        MLP_FWD_BLOCK, N_BEND_W, pack_fused_weights, _mlp_core)
    R, S = pts.shape[:-1]
    latents_per_pt = jnp.broadcast_to(latents[..., None, :],
                                      (R, S, latents.shape[-1]))
    bent, bend_details = bend_points(params["bender"], pts, latents_per_pt,
                                     compute_dtype=jnp.dtype(cfg.compute_dtype))
    emb = fourier_embed(bent, cfg.multires)              # (R, S, 63) f32
    n = R * S
    block = MLP_FWD_BLOCK
    n_pad = -(-n // block) * block
    emb_flat = jnp.zeros((n_pad, 64), jnp.float32)
    emb_flat = emb_flat.at[:n, :63].set(emb.reshape(n, 63))
    mw = pack_fused_weights(params, cfg.multires, network)[N_BEND_W:]
    raw = _mlp_core(emb_flat, mw, block)[:n, :4].reshape(R, S, 4)
    if not detailed:
        return raw
    details = {
        "initial_input_pts": jax.lax.stop_gradient(pts),
        "unmasked_offsets": bend_details["unmasked_offsets"],
        "rigidity_mask": bend_details["rigidity_mask"],
        "masked_offsets": bend_details["masked_offsets"],
        "input_pts": jax.lax.stop_gradient(bent),
    }
    return raw, details


def query_points(params, cfg: ModelConfig, pts, viewdirs, latents,
                 edit: EditConfig = EditConfig(), network: str = "coarse",
                 detailed: bool = False):
    """Evaluate the radiance field at ray sample points.

    Args:
      params: dict with "coarse"/"fine" canonical MLP params and optionally
        "bender" (bending + rigidity) params.
      pts:      (R, S, 3) world-space sample points.
      viewdirs: (R, 3) unit view directions, or None.
      latents:  (R, L) per-ray deformation latent codes (ignored when the
        model has no bending and no time conditioning).
      network:  "coarse" | "fine".
      detailed: also return the internals dict the regularizers consume
        (reference: the detailed_output threading, train.py:875-972).

    Returns raw (R, S, 4), or (raw, details) when detailed.
    """
    if _use_fused_kernel(cfg, edit):
        return _fused_query_points(params, cfg, pts, latents, network,
                                   detailed)

    nerf_params = params[network]
    bender = params.get("bender") if cfg.use_ray_bending else None
    R, S = pts.shape[:-1]

    details = {"initial_input_pts": jax.lax.stop_gradient(pts)} if detailed \
        else None

    latents_per_pt = None
    if cfg.use_ray_bending or cfg.time_conditioned_baseline:
        latents_per_pt = jnp.broadcast_to(
            latents[..., None, :], (R, S, latents.shape[-1]))

    if bender is not None and not edit.render_canonical:
        bent_pts, bend_details = bend_points(
            bender, pts, latents_per_pt,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            rigidity_test_time_cutoff=edit.rigidity_test_time_cutoff,
            test_time_scaling=edit.test_time_scaling,
            activation=cfg.bending_activation)
        if detailed:
            details.update(
                {k: v for k, v in bend_details.items()})
            details["input_pts"] = jax.lax.stop_gradient(bent_pts)
        rigidity = bend_details.get("rigidity_mask")
    else:
        bent_pts = pts
        rigidity = None
        if detailed:
            details["input_pts"] = jax.lax.stop_gradient(pts)

    embedded = _embed_pts(cfg, bent_pts)

    embedded_views = None
    if cfg.use_viewdirs:
        if bender is not None and not edit.render_canonical:
            if cfg.approx_nonrigid_viewdirs:
                dirs = _finite_difference_viewdirs(bent_pts)
            else:
                # exact: directional derivative of the bending map along the
                # unbent ray direction, J_bend(x) @ d, in ONE forward-mode
                # jvp (the reference needs 3 reverse passes,
                # run_nerf_helpers.py:371-385)
                d = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)

                def _bend(p):
                    return bend_points(
                        bender, p, latents_per_pt,
                        compute_dtype=jnp.dtype(cfg.compute_dtype),
                        rigidity_test_time_cutoff=edit.rigidity_test_time_cutoff,
                        test_time_scaling=edit.test_time_scaling,
                        activation=cfg.bending_activation)[0]

                from nonrigid_nerf_tpu.ops.math import safe_norm
                _, dd = jax.jvp(_bend, (pts,), (d,))
                dirs = dd / (safe_norm(dd, axis=-1, keepdims=True) + 1e-6)
        else:
            dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
        embedded_views = _embed_views(cfg, dirs)

    raw = nerf_mlp_apply(nerf_params, cfg, embedded, embedded_views,
                         latents_per_pt)

    # test-time foreground removal: make nonrigid content invisible
    # (reference: run_nerf_helpers.py:309-311)
    if edit.nonrigid_object_removal_threshold is not None and rigidity is not None:
        removal = rigidity[..., 0] >= edit.nonrigid_object_removal_threshold
        raw = raw.at[..., 3].set(jnp.where(removal, 0.0, raw[..., 3]))

    if detailed:
        return raw, details
    return raw
