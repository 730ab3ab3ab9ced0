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
    if cfg.fused_kernel == "int8":
        # int8 is inference-only and covers the no-viewdirs MLP on TPU;
        # anything outside that falls back to the XLA f32 path rather than
        # erroring (scene edits still work: they ride the XLA bend stage /
        # the raw post-edit, not the MLP kernel). Tests force the kernel on
        # CPU through pallas interpret mode.
        return (jax.default_backend() == "tpu"
                and supports_fused_query(cfg) and not cfg.use_viewdirs
                and not cfg.time_conditioned_baseline
                and not _edits_active(edit))
    if not supports_fused_query(cfg) or _edits_active(edit) or (
            cfg.fused_kernel == "pts" and not _encode_in_kernel(cfg)):
        if cfg.fused_kernel in ("on", "pts"):
            raise ValueError(
                f"fused_kernel={cfg.fused_kernel!r} but the configuration "
                "(architecture, viewdirs, or scene edits) is outside the "
                "kernel's support; use fused_kernel='auto'")
        return False
    if cfg.fused_kernel in ("on", "pts"):
        return True
    return jax.default_backend() == "tpu"


def embed_for_mlp(cfg: ModelConfig, bent_pts, fused: bool):
    """Positional encoding of bent points in the dtype the MLP stage
    consumes (bf16 when the Pallas kernel runs; the cast fuses into the
    encoding)."""
    embedded = _embed_pts(cfg, bent_pts)
    if fused:
        embedded = embedded.astype(jnp.bfloat16)
    return embedded


def sample_viewdirs(params, cfg: ModelConfig, pts, stage1, viewdirs,
                    edit: EditConfig = EditConfig()):
    """Per-sample view directions (R, S, 3) for a block of sample points.

    For bent rays the direction per sample differs from the straight ray
    direction (reference: run_nerf_helpers.py:316-385): the approx variant
    takes normalized backward finite differences between consecutive bent
    samples (REQUIRES pts in ascending-z order along axis -2), the exact
    variant is the bending Jacobian applied to the unbent direction in ONE
    forward-mode jvp (pass- and order-independent).
    """
    bender = params.get("bender") if cfg.use_ray_bending else None
    if bender is None or edit.render_canonical:
        return jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
    if cfg.approx_nonrigid_viewdirs:
        return _finite_difference_viewdirs(stage1["bent_pts"])
    d = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)

    def _bend(p):
        return bend_points(
            bender, p, stage1["latents_per_pt"],
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            rigidity_test_time_cutoff=edit.rigidity_test_time_cutoff,
            test_time_scaling=edit.test_time_scaling,
            activation=cfg.bending_activation)[0]

    from nonrigid_nerf_tpu.ops.math import safe_norm
    _, dd = jax.jvp(_bend, (pts,), (d,))
    return dd / (safe_norm(dd, axis=-1, keepdims=True) + 1e-6)


def bend_encode_stage(params, cfg: ModelConfig, pts, latents,
                      edit: EditConfig = EditConfig(),
                      detailed: bool = False, fused: bool = False,
                      embed: bool = True):
    """Stage 1 of the point query: deformation field + positional encoding.

    This stage is NETWORK-INDEPENDENT — coarse and fine canonical MLPs
    consume the same bent/encoded points — so the renderer evaluates it once
    per sample point and reuses the coarse-sample results in the fine pass
    (the reference re-bends + re-encodes the coarse z_vals a second time,
    train.py:910-941, purely for implementation simplicity).

    pts (R, S, 3); latents (R, L) per ray. `embed=False` skips the positional
    encoding (embedded=None) for callers that must encode in a different
    sample order (the finite-difference-viewdirs fine pass sorts bent points
    before encoding). Returns a dict with:
      embedded       (R, S, input_ch), bf16 when fused (the Pallas MLP
                     kernel consumes bf16; the cast fuses into the encoding)
      bent_pts       (R, S, 3)
      rigidity       (R, S, 1) or None
      latents_per_pt (R, S, L) or None
      details        regularizer/visualization internals dict, or None
    """
    R, S = pts.shape[:-1]
    bender = params.get("bender") if cfg.use_ray_bending else None
    details = {"initial_input_pts": jax.lax.stop_gradient(pts)} if detailed \
        else None

    latents_per_pt = None
    if cfg.use_ray_bending or cfg.time_conditioned_baseline:
        latents_per_pt = jnp.broadcast_to(
            latents[..., None, :], (R, S, latents.shape[-1]))

    rigidity = None
    if bender is not None and not edit.render_canonical:
        bent_pts, bend_details = bend_points(
            bender, pts, latents_per_pt,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            rigidity_test_time_cutoff=edit.rigidity_test_time_cutoff,
            test_time_scaling=edit.test_time_scaling,
            activation=cfg.bending_activation)
        rigidity = bend_details.get("rigidity_mask")
        if detailed:
            details.update(bend_details)
            details["input_pts"] = jax.lax.stop_gradient(bent_pts)
    else:
        bent_pts = pts
        if detailed:
            details["input_pts"] = jax.lax.stop_gradient(pts)

    if not embed:
        embedded = None
    elif fused and _encode_in_kernel(cfg):
        # the MLP kernel encodes in VMEM (_mlpe_core): hand over the raw
        # bent points instead of materializing the (.., 63) encoding in HBM
        embedded = bent_pts
    else:
        embedded = embed_for_mlp(cfg, bent_pts, fused)
    return {"embedded": embedded, "bent_pts": bent_pts, "rigidity": rigidity,
            "latents_per_pt": latents_per_pt, "details": details}


def canonical_mlp_stage(params, cfg: ModelConfig, network: str, stage1,
                        embedded_views=None, edit: EditConfig = EditConfig(),
                        fused: bool = False):
    """Stage 2 of the point query: the per-network canonical MLP (+ the
    test-time foreground-removal edit, reference run_nerf_helpers.py:309-311).

    fused=True runs the 8x256 MLP as the Pallas kernel (ops/pallas/
    fused_query) with VMEM-resident weights and an in-VMEM recompute
    backward — the FLOP and activation-traffic bulk of the model. The
    bend/encode stage stays in XLA either way: a hand kernel measures
    SLOWER there (small-lane ops cost full 128-lane vregs in Mosaic and
    the stage is transcendental/IO-bound, not matmul-bound).
    """
    embedded = stage1["embedded"]
    if fused:
        from nonrigid_nerf_tpu.ops.pallas.fused_query import (
            MLP_FWD_BLOCK, PTS_PAD, VEMB, pack_mlp_weights,
            pack_mlp_pts_weights, pad_lanes, pack_viewdirs_mlp_weights,
            _mlp_core, _mlpe_core, _mlpv_core)
        if cfg.time_conditioned_baseline:
            # the latent rides in the MLP input (reference:
            # run_nerf_helpers.py:207-209)
            embedded = jnp.concatenate(
                [embedded,
                 stage1["latents_per_pt"].astype(embedded.dtype)], axis=-1)
        R, S = embedded.shape[:2]
        n = R * S
        in_ch = embedded.shape[-1]
        block = MLP_FWD_BLOCK
        n_pad = -(-n // block) * block
        if _encode_in_kernel(cfg):
            # stage 1 handed over raw bent points (see bend_encode_stage);
            # the kernel encodes them in VMEM
            pts_flat = jnp.pad(
                embedded.reshape(n, in_ch).astype(jnp.float32),
                ((0, n_pad - n), (0, PTS_PAD - in_ch)))
            mw = pack_mlp_pts_weights(params, network, cfg.multires)
            raw = _mlpe_core(pts_flat, mw, block)
            raw = raw[:n, :4].reshape(R, S, 4)
            return _apply_removal_edit(raw, stage1["rigidity"], edit)
        emb_flat = jnp.pad(embedded.reshape(n, in_ch),
                           ((0, n_pad - n), (0, pad_lanes(in_ch) - in_ch)))
        if cfg.use_viewdirs:
            ev = embedded_views.astype(jnp.bfloat16)
            embv_flat = jnp.pad(
                ev.reshape(n, ev.shape[-1]),
                ((0, n_pad - n), (0, VEMB - ev.shape[-1])))
            mv = pack_viewdirs_mlp_weights(params, network)
            raw = _mlpv_core(emb_flat, embv_flat, mv, block)
        elif cfg.fused_kernel == "int8":
            from nonrigid_nerf_tpu.ops.pallas.quant_mlp import (
                mlp_i8_core, packed_int8_weights)
            if "quant" not in params or network not in params["quant"]:
                raise ValueError(
                    "fused_kernel='int8' needs calibration scales in "
                    "params['quant']; run quantize_for_inference() first")
            qw = packed_int8_weights(params["quant"][network], params,
                                     network, cfg.multires)
            raw = mlp_i8_core(emb_flat, qw, block)
        else:
            mw = pack_mlp_weights(params, network, in_ch=in_ch)
            raw = _mlp_core(emb_flat, mw, block)
        raw = raw[:n, :4].reshape(R, S, 4)
    else:
        raw = nerf_mlp_apply(params[network], cfg, embedded, embedded_views,
                             stage1["latents_per_pt"])

    return _apply_removal_edit(raw, stage1["rigidity"], edit)


def _apply_removal_edit(raw, rigidity, edit: EditConfig):
    """Test-time foreground removal: zero density where rigidity >=
    threshold (reference: run_nerf_helpers.py:309-311)."""
    if edit.nonrigid_object_removal_threshold is not None \
            and rigidity is not None:
        removal = rigidity[..., 0] >= edit.nonrigid_object_removal_threshold
        raw = raw.at[..., 3].set(jnp.where(removal, 0.0, raw[..., 3]))
    return raw


def use_fused_kernel(cfg: ModelConfig, edit: EditConfig) -> bool:
    """Public alias of the fused-path predicate for the renderer."""
    return _use_fused_kernel(cfg, edit)


def edits_active(edit: EditConfig) -> bool:
    """Public alias: whether any test-time scene edit is requested."""
    return _edits_active(edit)


def _encode_in_kernel(cfg: ModelConfig) -> bool:
    """Whether the fused path computes the Fourier encoding INSIDE the MLP
    kernel (stage 1 hands over raw bent points, 16x narrower than the
    encoding in both directions of the HBM hop).

    OPT-IN (`fused_kernel="pts"`), and a measured NEGATIVE on v5e: despite
    the narrower HBM hop, the in-VMEM encode is slower than XLA's —
    training 118.6k vs 142.0k rays/s, kernel forward 4.35 ms vs 4.07 ms
    per 196k pts including the XLA encode (see ROADMAP.md). Kept because
    the balance shifts wherever HBM bandwidth per FLOP is tighter."""
    return (cfg.fused_kernel == "pts" and not cfg.use_viewdirs
            and not cfg.time_conditioned_baseline
            and cfg.i_embed == 0 and cfg.multires == 10)


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
    fused = _use_fused_kernel(cfg, edit)
    st = bend_encode_stage(params, cfg, pts, latents, edit, detailed, fused)

    embedded_views = None
    if cfg.use_viewdirs:
        # exact mode: J_bend(x) @ d in ONE forward-mode jvp (the reference
        # needs 3 reverse passes, run_nerf_helpers.py:371-385)
        dirs = sample_viewdirs(params, cfg, pts, st, viewdirs, edit)
        embedded_views = _embed_views(cfg, dirs)

    raw = canonical_mlp_stage(params, cfg, network, st, embedded_views,
                              edit, fused)
    if detailed:
        return raw, st["details"]
    return raw
