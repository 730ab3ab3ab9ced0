"""Render pose sequences to images + artifact files.

Behavioral contract (reference: render_path, train.py:419-553): per frame
writes `{i:03d}.png`, `disp_{i:03d}.png` (max-normalized), jet and
Blinn-Phong disparity visualizations, and jet error maps against ground
truth; `render_factor` downscales intrinsics for fast previews.

TPU notes: one jitted block renderer is reused across frames (all frames of
a view share H x W); rays stream through fixed-shape lax.map blocks.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nonrigid_nerf_tpu.config import EditConfig, ModelConfig, RenderSettings
from nonrigid_nerf_tpu.ops.math import to8b
from nonrigid_nerf_tpu.ops.rays import get_rays
from nonrigid_nerf_tpu.utils.viz import (disparity_to_blinn_phong,
                                         disparity_to_jet)


def downscale_intrinsics(intrinsics, render_factor: int):
    if not render_factor:
        return intrinsics
    out = []
    for intrin in intrinsics:
        new = dict(intrin)
        new["height"] = intrin["height"] // render_factor
        new["width"] = intrin["width"] // render_factor
        for k in ("focal_x", "focal_y", "center_x", "center_y"):
            new[k] = intrin[k] / render_factor
        out.append(new)
    return out


def render_path(params, cfg: ModelConfig, rs: RenderSettings, render_poses,
                intrinsics, latents, chunk: int = 32768,
                gt_imgs=None, savedir: Optional[str] = None,
                render_factor: int = 0, detailed: bool = False,
                edit: EditConfig = EditConfig(), renderer=None,
                verbose: bool = True):
    """Render each pose with its latent code.

    render_poses: (F, 3, 4+) array-likes; intrinsics: list of F dicts;
    latents: (F, L) per-frame deformation codes.

    Returns (rgbs, disps) stacked numpy arrays, plus a list of per-frame
    detail dicts when `detailed`.
    """
    rs = rs.test_mode()
    intrinsics = downscale_intrinsics(intrinsics, render_factor)

    rgbs, disps, all_details = [], [], []
    renderer_cache = {}
    t0 = time.time()
    for i, (c2w, intrin) in enumerate(zip(render_poses, intrinsics)):
        H, W = int(intrin["height"]), int(intrin["width"])
        if renderer is None:
            key_hw = (H, W)
            if key_hw not in renderer_cache:
                # shards rays over all visible devices when there are
                # several (reference analog: DataParallel render wrapper,
                # train.py:320-323)
                from nonrigid_nerf_tpu.parallel import make_auto_renderer
                renderer_cache[key_hw] = make_auto_renderer(
                    cfg, rs, edit=edit, chunk=chunk, detailed=detailed,
                    n_rays_hint=H * W)
            render_fn = renderer_cache[key_hw]
        else:
            render_fn = renderer

        rays_o, rays_d = get_rays(jnp.asarray(np.asarray(c2w)[:3, :4],
                                              jnp.float32), intrin)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        frame_latents = jnp.broadcast_to(
            jnp.asarray(latents[i]).reshape(1, -1),
            (H * W, np.asarray(latents[i]).size))

        out = render_fn(params, rays_o, rays_d, frame_latents, None)
        rgb = np.asarray(out["rgb_map"]).reshape(H, W, 3)
        disp = np.asarray(out["disp_map"]).reshape(H, W)
        rgbs.append(rgb)
        disps.append(disp)
        if detailed:
            details = {k: np.asarray(v).reshape((H, W) + v.shape[1:])
                       for k, v in out.items()
                       if k not in ("rgb_map", "disp_map")}
            all_details.append(details)
        if verbose:
            print(f"render_path frame {i}: {time.time() - t0:.2f}s",
                  flush=True)
            t0 = time.time()

        if savedir is not None:
            import imageio.v2 as imageio
            imageio.imwrite(os.path.join(savedir, f"{i:03d}.png"), to8b(rgb))
            raw_disp = disp / max(float(disp.max()), 1e-10)
            imageio.imwrite(os.path.join(savedir, f"disp_{i:03d}.png"),
                            to8b(raw_disp))
            imageio.imwrite(os.path.join(savedir, f"disp_jet_{i:03d}.png"),
                            to8b(disparity_to_jet(raw_disp)))
            imageio.imwrite(os.path.join(savedir, f"disp_phong_{i:03d}.png"),
                            to8b(disparity_to_blinn_phong(raw_disp)))
            if gt_imgs is not None:
                gt = np.asarray(gt_imgs[i])
                if render_factor:
                    gt = gt[::render_factor, ::render_factor][:H, :W]
                error = np.linalg.norm(gt - rgb, axis=-1) / np.sqrt(3.0)
                error = np.clip(error * 10.0, 0.0, 1.0)  # exaggerate
                imageio.imwrite(os.path.join(savedir, f"error_{i:03d}.png"),
                                to8b(disparity_to_jet(error)))

    rgbs = np.stack(rgbs, 0)
    disps = np.stack(disps, 0)
    if detailed:
        return rgbs, disps, all_details
    return rgbs, disps
