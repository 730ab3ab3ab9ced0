"""Volumetric rendering engine: coarse + fine passes over ray blocks.

Behavioral contract (reference: render_rays, train.py:792-980, and the
render/batchify_rays drivers, train.py:27-137,326-416).

TPU-first design: `render_rays` is one pure function over a fixed-size ray
block — sampling, both network passes, importance resampling, and
compositing fuse into a single XLA program. Chunked streaming (the
reference's batchify_rays) becomes `jax.lax.map` over fixed-shape blocks
inside jit; there is no Python-level chunk loop on the hot path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.config import EditConfig, ModelConfig, RenderSettings
from nonrigid_nerf_tpu.engine.query import (_embed_views, bend_encode_stage,
                                            canonical_mlp_stage,
                                            embed_for_mlp, query_points,
                                            sample_viewdirs,
                                            use_fused_kernel)
from nonrigid_nerf_tpu.ops.compositing import raw2outputs
from nonrigid_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals


@jax.custom_vjp
def _sort_merge(z, *payloads):
    """Sort z ascending along the last axis, applying the same permutation
    to every payload tensor (..., S, C).

    TPU-first: XLA's gather (take_along_axis) lowers to a serial loop on
    TPU, so the permutation is carried through a VARIADIC vectorized sort —
    each payload channel rides along as a sort operand. The custom backward
    inverse-permutes the cotangents with a second payload-carrying sort
    keyed by the saved permutation (a permutation of iota), so neither
    direction ever emits a gather.
    """
    z_sorted, _, sorted_payloads = _sort_merge_impl(z, payloads)
    return (z_sorted,) + sorted_payloads


def _unstack(payloads):
    chans, splits = [], []
    for leaf in payloads:
        c = leaf.shape[-1]
        splits.append(c)
        chans.extend(leaf[..., i] for i in range(c))
    return chans, splits


def _restack(chans, splits):
    out, i = [], 0
    for c in splits:
        out.append(jnp.stack(chans[i:i + c], axis=-1))
        i += c
    return tuple(out)


def _sort_merge_impl(z, payloads):
    chans, splits = _unstack(payloads)
    iota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, z.shape[-1]), z.shape)
    out = jax.lax.sort((z, iota) + tuple(chans), dimension=-1,
                       num_keys=1, is_stable=True)
    return out[0], out[1], _restack(out[2:], splits)


def _sort_merge_fwd(z, *payloads):
    z_sorted, perm, sorted_payloads = _sort_merge_impl(z, payloads)
    return (z_sorted,) + sorted_payloads, perm


def _sort_merge_bwd(perm, cots):
    dz_sorted, dpayloads = cots[0], cots[1:]
    chans, splits = _unstack(dpayloads)
    # perm is a permutation of iota: sorting BY perm restores the original
    # (pre-sort) order — the exact transpose of the forward permutation
    out = jax.lax.sort((perm, dz_sorted) + tuple(chans), dimension=-1,
                       num_keys=1)
    return (out[1],) + _restack(out[2:], splits)


_sort_merge.defvjp(_sort_merge_fwd, _sort_merge_bwd)


def stage1_reuse(cfg: ModelConfig) -> bool:
    """Whether the fine pass reuses the coarse samples' stage-1 results
    instead of re-running the deformation field on them (see render_rays).
    Config-static so FLOP accounting (utils/flops.py) tracks the
    implementation."""
    return cfg.stage1_reuse


def render_rays(params, cfg: ModelConfig, rs: RenderSettings,
                rays_o, rays_d, latents, key: Optional[jax.Array] = None,
                edit: EditConfig = EditConfig(), detailed: bool = False,
                retraw: bool = False,
                fine_detailed: Optional[bool] = None):
    """Render a block of rays. Returns a dict of per-ray outputs.

    rays_o, rays_d: (R, 3); latents: (R, L); key: PRNG key for stratified
    jitter / density noise / importance draws (None => deterministic).

    fine_detailed (default: follow `detailed`): whether the fine pass also
    returns its per-sample internals (fine_* keys). The training losses
    consume only the COARSE internals (reference train.py:219-286), so the
    train step passes False — otherwise the unused fine detail channels
    would ride through the compositing sort and defeat dead-code
    elimination.
    """
    R = rays_o.shape[0]
    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if key is not None:
        k_strat, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)
    else:
        k_strat = k_noise0 = k_pdf = k_noise1 = None

    z_vals = stratified_z_vals(k_strat, rs.near, rs.far, R, rs.N_samples,
                               lindisp=rs.lindisp, perturb=rs.perturb,
                               dtype=rays_o.dtype)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

    # The deformation field + positional encoding (stage 1) is shared by the
    # coarse and fine networks, and the raw output at a point does not
    # depend on neighboring samples. So bend (and where possible encode)
    # each sample point ONCE: the fine pass below reuses the coarse samples'
    # stage-1 results and only runs stage 1 on the NEW importance samples.
    # The reference re-bends + re-encodes the coarse z_vals a second time
    # inside the fine pass (train.py:910-941) purely for implementation
    # simplicity; values and gradients are identical (one evaluation
    # consumed by both compositions accumulates the same cotangents as two
    # bit-identical evaluations). This cuts bend work per step by 25%
    # (256 -> 192 bend evaluations per ray). View directions do not break
    # the reuse: the exact (bending-Jacobian) direction of a point is pass-
    # independent, and the finite-difference directions need only the BENT
    # points in z-sorted order, which the payload-carrying sort provides.
    fused = use_fused_kernel(cfg, edit)
    reuse = stage1_reuse(cfg)
    # FD nonrigid dirs depend on sample ORDER: that fine pass sorts bent
    # points before the MLP instead of sorting raw outputs after it
    fd_nonrigid = (cfg.use_viewdirs and cfg.approx_nonrigid_viewdirs
                   and cfg.use_ray_bending and not edit.render_canonical)
    fine_detailed = detailed if fine_detailed is None \
        else (fine_detailed and detailed)

    if reuse:
        st = bend_encode_stage(params, cfg, pts, latents, edit, detailed,
                               fused)
        ev_coarse = None
        dirs_coarse = None
        if cfg.use_viewdirs:
            # coarse z_vals are ascending by construction, so the FD
            # variant is valid directly on the coarse bent points
            dirs_coarse = sample_viewdirs(params, cfg, pts, st, viewdirs,
                                          edit)
            ev_coarse = _embed_views(cfg, dirs_coarse)
        raw = canonical_mlp_stage(params, cfg, "coarse", st, ev_coarse,
                                  edit, fused)
        details = st["details"]
    else:
        out = query_points(params, cfg, pts, viewdirs, latents, edit,
                           network="coarse", detailed=detailed)
        raw, details = out if detailed else (out, None)

    coarse = raw2outputs(raw, z_vals, rays_d, rs.raw_noise_std,
                         rs.white_bkgd, noise_key=k_noise0)

    ret = {}
    if rs.N_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_pdf, z_mid, coarse.visibility_weights[..., 1:-1],
            rs.N_importance, det=(rs.perturb == 0.0))
        fine_net = "fine" if "fine" in params else "coarse"

        if reuse:
            pts_new = (rays_o[..., None, :]
                       + rays_d[..., None, :] * z_samples[..., :, None])
            # the FD-viewdirs fine pass encodes AFTER the sort (below), so
            # the pre-sort encoding of the new points would be dead work
            st_new = bend_encode_stage(params, cfg, pts_new, latents,
                                       edit, fine_detailed, fused,
                                       embed=not fd_nonrigid)
            z_cat = jnp.concatenate([z_vals, z_samples], -1)

            def cat(a, b):
                return jnp.concatenate([a, b], axis=-2)

            latents_cat = (
                jnp.broadcast_to(latents[..., None, :],
                                 z_cat.shape + (latents.shape[-1],))
                if st["latents_per_pt"] is not None else None)
            bent_cat = cat(st["bent_pts"], st_new["bent_pts"])
            rigidity_cat = (cat(st["rigidity"], st_new["rigidity"])
                            if st["rigidity"] is not None else None)
            det_cat = None
            if fine_detailed:
                det_cat = {k: cat(details[k], st_new["details"][k])
                           for k in st_new["details"]}

            if fd_nonrigid:
                # Finite-difference directions need the bent points in
                # z-sorted order, so here the SORT comes first: bent points
                # (3 ch), rigidity (1 ch), and any detail channels ride the
                # payload-carrying sort, directions + encoding + MLP then
                # run in sorted order and raw needs no further permutation.
                # The bend of the coarse samples is still computed once.
                payloads = [bent_cat]
                if rigidity_cat is not None:
                    payloads.append(rigidity_cat)
                keys = sorted(det_cat) if det_cat is not None else []
                payloads += [det_cat[k] for k in keys]
                merged = _sort_merge(z_cat, *payloads)
                z_all, bent_sorted = merged[0], merged[1]
                rest = list(merged[2:])
                rigidity_sorted = rest.pop(0) if rigidity_cat is not None \
                    else None
                fine_details = dict(zip(keys, rest)) if det_cat is not None \
                    else None
                st_sorted = {
                    "embedded": embed_for_mlp(cfg, bent_sorted, fused),
                    "bent_pts": bent_sorted,
                    "rigidity": rigidity_sorted,
                    "latents_per_pt": latents_cat,
                    "details": None,
                }
                dirs = sample_viewdirs(params, cfg, bent_sorted, st_sorted,
                                       viewdirs, edit)
                raw_fine = canonical_mlp_stage(
                    params, cfg, fine_net, st_sorted,
                    _embed_views(cfg, dirs), edit, fused)
            else:
                # The canonical MLP is POINTWISE (and exact/straight view
                # directions are per-point, order-independent), so the fine
                # network runs on the UNSORTED [coarse..., importance...]
                # union — the big embedded tensor is never permuted. Only
                # the compact per-sample outputs (raw, and the detail
                # channels when requested) ride through the payload-carrying
                # sort that orders z for compositing.
                ev_cat = None
                if cfg.use_viewdirs:
                    dirs_new = sample_viewdirs(params, cfg, pts_new, st_new,
                                               viewdirs, edit)
                    ev_cat = _embed_views(cfg, cat(dirs_coarse, dirs_new))
                st_cat = {
                    "embedded": cat(st["embedded"], st_new["embedded"]),
                    "bent_pts": bent_cat,
                    "rigidity": rigidity_cat,
                    "latents_per_pt": latents_cat,
                    "details": None,
                }
                raw_cat = canonical_mlp_stage(params, cfg, fine_net, st_cat,
                                              ev_cat, edit, fused)
                if fine_detailed:
                    keys = sorted(det_cat)
                    merged = _sort_merge(z_cat, raw_cat,
                                         *(det_cat[k] for k in keys))
                    z_all, raw_fine = merged[0], merged[1]
                    fine_details = dict(zip(keys, merged[2:]))
                else:
                    z_all, raw_fine = _sort_merge(z_cat, raw_cat)
                    fine_details = None
        else:
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1),
                             axis=-1)
            pts_fine = (rays_o[..., None, :]
                        + rays_d[..., None, :] * z_all[..., :, None])
            out = query_points(params, cfg, pts_fine, viewdirs, latents,
                               edit, network=fine_net,
                               detailed=fine_detailed)
            raw_fine, fine_details = out if fine_detailed else (out, None)

        fine = raw2outputs(raw_fine, z_all, rays_d, rs.raw_noise_std,
                           rs.white_bkgd, noise_key=k_noise1)

        ret.update(rgb_map=fine.rgb_map, disp_map=fine.disp_map,
                   acc_map=fine.acc_map, depth_map=fine.depth_map,
                   rgb0=coarse.rgb_map, disp0=coarse.disp_map,
                   acc0=coarse.acc_map,
                   z_std=jnp.std(z_samples, axis=-1))
        if retraw:
            ret["raw"] = raw_fine
        if fine_detailed:
            ret["fine_visibility_weights"] = fine.visibility_weights
            ret["fine_opacity_alpha"] = fine.opacity_alpha
            for k, v in fine_details.items():
                ret["fine_" + k] = v
    else:
        ret.update(rgb_map=coarse.rgb_map, disp_map=coarse.disp_map,
                   acc_map=coarse.acc_map, depth_map=coarse.depth_map)
        if retraw:
            ret["raw"] = raw

    if detailed:
        # coarse-pass internals, consumed by the offsets/divergence losses
        ret["visibility_weights"] = coarse.visibility_weights
        ret["opacity_alpha"] = coarse.opacity_alpha
        for k, v in details.items():
            ret[k] = v
    return ret


def make_ray_renderer(cfg: ModelConfig, rs: RenderSettings,
                      edit: EditConfig = EditConfig(), chunk: int = 32768,
                      detailed: bool = False, jit: bool = True,
                      postprocess=None):
    """Build a renderer for arbitrarily many rays.

    Rays are padded to a multiple of `chunk` and streamed block-by-block with
    `lax.map` inside one jitted program (the TPU replacement for the
    reference's Python batchify_rays loop, train.py:108-137).

    `postprocess(block_dict) -> dict` runs per block INSIDE the jitted
    program — use it to reduce heavy per-sample internals (e.g. the
    correspondence extraction in free-viewpoint rendering) to compact
    per-ray outputs on device instead of hauling (rays, samples, ...)
    tensors to the host.

    Returns fn(params, rays_o (N,3), rays_d (N,3), latents (N,L), key) -> dict.
    """
    # inference is forward-only, where XLA's pipelined MLP chain measures
    # slightly faster than the fused kernel (424k vs 408k rays/s on v5e —
    # the kernel earns its keep on the backward pass); leave the kernel to
    # explicit opt-in here
    if cfg.fused_kernel == "auto":
        import dataclasses
        cfg = dataclasses.replace(cfg, fused_kernel="off")

    def _render_many(params, rays_o, rays_d, latents, key):
        n = rays_o.shape[0]
        n_blocks = max(1, -(-n // chunk))
        pad = n_blocks * chunk - n

        def _pad(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0) \
                if pad else x

        ro = _pad(rays_o).reshape(n_blocks, chunk, 3)
        rd = _pad(rays_d).reshape(n_blocks, chunk, 3)
        lat = _pad(latents).reshape(n_blocks, chunk, latents.shape[-1])
        keys = (jax.random.split(key, n_blocks) if key is not None
                else jnp.zeros((n_blocks, 2), jnp.uint32))

        def _block(args):
            ro_b, rd_b, lat_b, key_b = args
            out = render_rays(params, cfg, rs, ro_b, rd_b, lat_b,
                              key=key_b if key is not None else None,
                              edit=edit, detailed=detailed)
            return postprocess(out) if postprocess is not None else out

        out = jax.lax.map(_block, (ro, rd, lat, keys))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((n_blocks * chunk,) + x.shape[2:])[:n], out)

    if jit:
        return jax.jit(_render_many)
    return _render_many
