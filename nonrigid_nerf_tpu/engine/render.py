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
from nonrigid_nerf_tpu.engine.query import (bend_encode_stage,
                                            canonical_mlp_stage,
                                            query_points, use_fused_kernel)
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
    # coarse and fine networks, and — without view directions — the raw
    # output at a point does not depend on neighboring samples. So bend and
    # encode each sample point ONCE: the fine pass below reuses the coarse
    # samples' stage-1 results and only runs stage 1 on the NEW importance
    # samples. The reference re-bends + re-encodes the coarse z_vals a
    # second time inside the fine pass (train.py:910-941) purely for
    # implementation simplicity; values and gradients are identical (one
    # evaluation consumed by both compositions accumulates the same
    # cotangents as two bit-identical evaluations). This cuts bend/encode
    # work per step by 25% (256 -> 192 bend evaluations per ray).
    fused = use_fused_kernel(cfg, edit)
    reuse_stage1 = not cfg.use_viewdirs   # FD/exact viewdirs differ per pass
    fine_detailed = detailed if fine_detailed is None \
        else (fine_detailed and detailed)

    if reuse_stage1:
        st = bend_encode_stage(params, cfg, pts, latents, edit, detailed,
                               fused)
        raw = canonical_mlp_stage(params, cfg, "coarse", st, None, edit,
                                  fused)
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

        if reuse_stage1:
            pts_new = (rays_o[..., None, :]
                       + rays_d[..., None, :] * z_samples[..., :, None])
            st_new = bend_encode_stage(params, cfg, pts_new, latents,
                                       edit, fine_detailed, fused)
            z_cat = jnp.concatenate([z_vals, z_samples], -1)

            # The canonical MLP is POINTWISE, so the fine network runs on
            # the UNSORTED [coarse..., importance...] union — the big
            # embedded tensor is never permuted. Only the compact per-sample
            # outputs (raw, and the detail channels when requested) ride
            # through the payload-carrying sort that orders z for
            # compositing.
            def cat(a, b):
                return jnp.concatenate([a, b], axis=-2)

            st_cat = {
                "embedded": cat(st["embedded"], st_new["embedded"]),
                "bent_pts": cat(st["bent_pts"], st_new["bent_pts"]),
                "rigidity": (cat(st["rigidity"], st_new["rigidity"])
                             if st["rigidity"] is not None else None),
                "latents_per_pt": (
                    jnp.broadcast_to(
                        latents[..., None, :],
                        z_cat.shape + (latents.shape[-1],))
                    if st["latents_per_pt"] is not None else None),
                "details": None,
            }
            raw_cat = canonical_mlp_stage(params, cfg, fine_net, st_cat,
                                          None, edit, fused)
            if fine_detailed:
                det_cat = {k: cat(details[k], st_new["details"][k])
                           for k in st_new["details"]}
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
