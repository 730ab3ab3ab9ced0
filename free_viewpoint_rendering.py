#!/usr/bin/env python
"""Free-viewpoint rendering, scene editing, and evaluation of a trained
NR-NeRF experiment.

CLI mirrors the reference (reference: free_viewpoint_rendering.py:880-941):

  python free_viewpoint_rendering.py --input <experiment folder>
      --deformations {train,test,all}
      --camera_path {input_reconstruction,fixed,spiral,adaptive_spiral,
                     time_interpolation} [--fixed_view N]
      [--forced_background_stabilization T] [--motion_factor F]
      [--foreground_removal T] [--render_canonical] [--output_video_fps N]

Per frame it writes rgb / correspondences / rigidity(+jet) / disp(+jet,
+phong) PNGs and mp4 videos; `fixed` paths additionally produce the
background-stability standard-deviation image, and `input_reconstruction`
paths a PSNR/SSIM/LPIPS `scores.json` with error-map folders
(reference: free_viewpoint_rendering.py:568-876).

TPU-first difference: the correspondence + rigidity visualizations need the
median-visibility surface sample per pixel; the reference hauls the full
(H, W, samples, 3) detail tensors to the host in windows of 10 frames.
Here that reduction runs inside the jitted renderer (see `_surface_post`),
so only compact (H, W, 3) maps leave the device.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO_DIR = os.path.dirname(os.path.realpath(__file__))
sys.path.insert(0, REPO_DIR)


def create_folder(folder):
    os.makedirs(folder, exist_ok=True)


def load_experiment(input_folder: str):
    """Load args + checkpoint of a trained experiment. Prefers the
    experiment's own backup/ code snapshot so old experiments render with
    their training-time code (reference: free_viewpoint_rendering.py:18-34)."""
    backup = os.path.join(input_folder, "backup")
    if os.path.isdir(os.path.join(backup, "nonrigid_nerf_tpu")):
        sys.path.insert(0, backup)

    from nonrigid_nerf_tpu.checkpoints import (latest_checkpoint,
                                               load_checkpoint)
    from nonrigid_nerf_tpu.config import Args, parse_config_file

    logdir = os.path.join(input_folder, "logs")
    args = Args(**parse_config_file(os.path.join(logdir, "args.txt")))
    ckpt_path = latest_checkpoint(logdir)
    if ckpt_path is None:
        raise FileNotFoundError(f"no checkpoint found under {logdir}")
    step, params, _, extras = load_checkpoint(ckpt_path)
    print(f"loaded checkpoint {ckpt_path} at step {step}")
    return args, params, extras


def _surface_post(out):
    """Device-side extraction of the median-visibility surface sample:
    canonical-space position + rigidity per pixel
    (reference host-side analog: free_viewpoint_rendering.py:616-658)."""
    import jax.numpy as jnp
    w = out.get("fine_visibility_weights", out.get("visibility_weights"))
    pts = out.get("fine_input_pts", out.get("input_pts"))
    acc = jnp.cumsum(w, axis=-1)
    idx = jnp.argmin(jnp.abs(acc - 0.5), axis=-1)        # (R,)
    surface = jnp.take_along_axis(pts, idx[:, None, None], axis=-2)[:, 0]
    res = {"rgb_map": out["rgb_map"], "disp_map": out["disp_map"],
           "surface_points": surface}
    rig_key = "fine_rigidity_mask" if "fine_rigidity_mask" in out else (
        "rigidity_mask" if "rigidity_mask" in out else None)
    if rig_key is not None:
        rig = jnp.take_along_axis(out[rig_key][..., 0], idx[:, None],
                                  axis=-1)[:, 0]
        res["surface_rigidity"] = rig
    return res


def setup(input_folder: str):
    """Programmatic API for a trained experiment (notebook / scripting use).

    The reference exposes the same capability as a tuple of closures from
    `_setup_nonrigid_nerf_network` (reference:
    free_viewpoint_rendering.py:392-411): weight loading, latent access,
    dataset reload, convenient rendering with scene-edit parameters, and
    image conversion helpers. Here it is one namespace:

        fvr = setup("experiments/my_scene")
        rgbs, disps = fvr.render(fvr.poses[:3], fvr.frame_latents[:3])
        edited, _   = fvr.render(fvr.poses[:1], fvr.frame_latents[:1],
                                 edit=EditConfig(test_time_scaling=2.0))

    Conversion helpers (`to8b`, `disparity_to_jet`,
    `disparity_to_blinn_phong`) and the raw pieces (params/cfg/rs/dataset)
    are attributes, so anything the CLI does can be scripted.
    """
    import types

    import jax.numpy as jnp  # noqa: F401  (ensures jax is importable early)

    args, params, ckpt_extras = load_experiment(input_folder)

    from nonrigid_nerf_tpu.config import (EditConfig,
                                          model_config_from_args,
                                          render_settings_from_args)
    from nonrigid_nerf_tpu.apps.render_path import render_path
    from nonrigid_nerf_tpu.ops.math import to8b
    from nonrigid_nerf_tpu.utils.viz import (disparity_to_blinn_phong,
                                             disparity_to_jet)
    import train as train_module

    (ds, images, poses, render_poses, intrinsics, extras,
     i_train, i_test) = train_module.load_dataset(args)

    cfg = model_config_from_args(args)
    rs = render_settings_from_args(args, ds.near, ds.far).test_mode()
    latents = np.asarray(params["latents"])
    frame_latents = np.stack(
        [latents[extras["imageid_to_timestepid"][i]]
         for i in range(len(images))])

    def render(render_poses_, frame_latents_, edit: EditConfig = None,
               render_factor: int = 0, detailed: bool = False,
               view_ids=None):
        """Render poses with per-frame latents; returns (rgbs, disps) numpy
        stacks (reference analog: render_convenient,
        free_viewpoint_rendering.py:202-337). `view_ids` picks per-frame
        intrinsics (defaults to view 0's)."""
        rp = np.asarray(render_poses_)
        if view_ids is None:
            view_ids = [extras["imageid_to_viewid"][0]] * len(rp)
        intr = [intrinsics[v] for v in view_ids]
        return render_path(
            params, cfg, rs, rp[:, :3, :4], intr,
            np.asarray(frame_latents_), chunk=args.chunk,
            render_factor=render_factor, detailed=detailed,
            edit=edit if edit is not None else EditConfig(), verbose=False)

    return types.SimpleNamespace(
        args=args, cfg=cfg, rs=rs, params=params, ckpt_extras=ckpt_extras,
        dataset=ds, images=images, poses=poses, render_poses=render_poses,
        intrinsics=intrinsics, extras=extras, i_train=i_train, i_test=i_test,
        latents=latents, frame_latents=frame_latents, render=render,
        to8b=to8b, disparity_to_jet=disparity_to_jet,
        disparity_to_blinn_phong=disparity_to_blinn_phong)


def free_viewpoint_rendering(fvr_args):
    args, params, ckpt_extras = load_experiment(fvr_args.input)

    try:
        from nonrigid_nerf_tpu.utils.compile_cache import \
            enable_compilation_cache
        enable_compilation_cache(getattr(args, "compilation_cache_dir", None))
    except ImportError:
        pass   # the experiment's backup/ snapshot predates the cache module

    import jax.numpy as jnp

    from nonrigid_nerf_tpu.config import (EditConfig, model_config_from_args,
                                          render_settings_from_args)
    from nonrigid_nerf_tpu.ops.math import to8b
    from nonrigid_nerf_tpu.ops.rays import get_rays
    from nonrigid_nerf_tpu.utils.metrics import lpips_distance, psnr, ssim
    from nonrigid_nerf_tpu.utils.video import write_video
    from nonrigid_nerf_tpu.utils.viz import (disparity_to_blinn_phong,
                                             disparity_to_jet)
    import train as train_module

    cfg = model_config_from_args(args)
    edit = EditConfig(
        rigidity_test_time_cutoff=fvr_args.forced_background_stabilization,
        test_time_scaling=fvr_args.motion_factor,
        nonrigid_object_removal_threshold=fvr_args.foreground_removal,
        render_canonical=fvr_args.render_canonical)

    try:
        from nonrigid_nerf_tpu.engine.query import edits_active
    except ImportError:
        # the experiment's backup/ snapshot predates the public name
        from nonrigid_nerf_tpu.engine.query import (
            _edits_active as edits_active)
    if cfg.fused_kernel in ("on", "pts") and edits_active(edit):
        # a FORCED kernel mode in the experiment's args.txt would make the
        # engine refuse scene edits outright; a render-time user never
        # chose that failure mode, so degrade to the auto policy
        import dataclasses
        print(f"fused_kernel={cfg.fused_kernel!r} (from the experiment's "
              "args.txt) does not support scene edits; rendering with "
              "fused_kernel='auto'", flush=True)
        cfg = dataclasses.replace(cfg, fused_kernel="auto")

    if fvr_args.quantize_inference and (
            getattr(args, "use_viewdirs", False)
            or getattr(args, "time_conditioned_baseline", False)):
        # the int8 kernel covers the no-viewdirs canonical MLP only
        # (see _use_fused_kernel); don't calibrate what can't run
        print("--quantize_inference: unsupported for viewdirs/baseline "
              "models; rendering with the default path", flush=True)
        fvr_args.quantize_inference = False
    if fvr_args.quantize_inference:
        # the kernel also declines at render time for active scene edits or
        # a non-TPU backend — check NOW so the output folder is not named
        # _int8 for renders that would silently take the f32 path
        import dataclasses
        from nonrigid_nerf_tpu.engine.query import use_fused_kernel
        cfg_int8 = dataclasses.replace(cfg, fused_kernel="int8")
        if not use_fused_kernel(cfg_int8, edit):
            print("--quantize_inference: the int8 kernel does not run for "
                  "this configuration (scene edits active, a non-default "
                  "MLP architecture, or backend is not TPU); rendering "
                  "with the default f32 path", flush=True)
            fvr_args.quantize_inference = False

    # output folder name encodes path + edits
    # (reference: free_viewpoint_rendering.py:425-446)
    output_name = fvr_args.deformations + "_" + fvr_args.camera_path
    if fvr_args.camera_path == "fixed":
        output_name += "_" + str(fvr_args.fixed_view)
    if fvr_args.forced_background_stabilization is not None:
        output_name += "_fbs_" + str(fvr_args.forced_background_stabilization)
    if fvr_args.motion_factor is not None:
        output_name += "_exaggeration_" + str(fvr_args.motion_factor)
    if fvr_args.foreground_removal is not None:
        output_name += "_removal_" + str(fvr_args.foreground_removal)
    if fvr_args.render_canonical:
        output_name += "_canonical"
    if fvr_args.quantize_inference:
        output_name += "_int8"
    if fvr_args.view_stride > 1:
        output_name += "_stride" + str(fvr_args.view_stride)
    output_folder = os.path.join(fvr_args.input, "output", output_name)
    create_folder(output_folder)

    # reload the dataset this experiment was trained on
    (ds, images, poses, render_poses, intrinsics, extras,
     i_train, i_test) = train_module.load_dataset(args)

    rs = render_settings_from_args(args, ds.near, ds.far).test_mode()

    latents = np.asarray(params["latents"])      # (T, L)
    frame_latents = np.stack(
        [latents[extras["imageid_to_timestepid"][i]]
         for i in range(len(images))])           # (N, L)

    if fvr_args.quantize_inference:
        # post-training int8: calibrate activation scales on rays + latents
        # spread across the sequence, then route the canonical MLP through
        # the int8 MXU kernel (ops/pallas/quant_mlp.py)
        import dataclasses
        try:
            from nonrigid_nerf_tpu.ops.pallas.quant_mlp import \
                quantize_for_inference
        except ImportError as e:
            raise SystemExit(
                "--quantize_inference needs nonrigid_nerf_tpu.ops.pallas."
                "quant_mlp, but this experiment's backup/ code snapshot "
                "predates it. Copy the module into the snapshot or rerun "
                "from a repo checkout without the snapshot on sys.path."
            ) from e
        sel = np.unique(np.linspace(0, len(images) - 1, 8).astype(int))
        cal_o, cal_d, cal_l = [], [], []
        for i in sel:
            intrin = intrinsics[extras["imageid_to_viewid"][i]]
            co, cd = get_rays(
                jnp.asarray(np.asarray(poses[i])[:3, :4], jnp.float32),
                intrin)
            co = np.asarray(co).reshape(-1, 3)
            cd = np.asarray(cd).reshape(-1, 3)
            stride = max(1, co.shape[0] // 64)
            cal_o.append(co[::stride][:64])
            cal_d.append(cd[::stride][:64])
            cal_l.append(np.broadcast_to(
                frame_latents[i],
                (cal_o[-1].shape[0], frame_latents.shape[-1])))
        params = quantize_for_inference(
            params, cfg, np.concatenate(cal_o), np.concatenate(cal_d),
            np.concatenate(cal_l), ds.near, ds.far, n_rays=512)
        cfg = dataclasses.replace(cfg, fused_kernel="int8")
        print(f"int8 inference: calibrated on {len(sel)} frames", flush=True)

    # deformation subset (reference: free_viewpoint_rendering.py:494-509)
    if fvr_args.deformations == "train":
        indices = np.asarray(i_train)
    elif fvr_args.deformations == "test":
        indices = np.asarray(i_test)
    elif fvr_args.deformations == "all":
        indices = np.arange(len(images))
    else:
        raise ValueError("invalid --deformations argument")
    if len(indices) == 0:
        raise ValueError(f"deformation subset {fvr_args.deformations!r} "
                         "is empty for this experiment")
    if fvr_args.view_stride > 1:
        # evaluate/render every k-th frame of the subset (scores.json stays
        # ground-truth-aligned; output folder is suffixed _stride{k} so
        # full-protocol and subsampled artifacts can't be confused)
        indices = indices[::fvr_args.view_stride]
    sub_poses = poses[indices]
    sub_latents = frame_latents[indices]
    sub_images = images[indices]

    # camera path (reference: free_viewpoint_rendering.py:520-545)
    num_frames = len(indices)
    if fvr_args.camera_path == "input_reconstruction":
        path_poses = sub_poses
        path_intrinsics = [intrinsics[extras["imageid_to_viewid"][i]]
                           for i in indices]
    elif fvr_args.camera_path == "fixed":
        fixed = fvr_args.fixed_view
        path_poses = np.tile(poses[fixed][None], (num_frames, 1, 1))
        path_intrinsics = [intrinsics[extras["imageid_to_viewid"][fixed]]
                           ] * num_frames
    elif fvr_args.camera_path == "spiral":
        reps = -(-num_frames // max(len(render_poses), 1))
        path_poses = np.concatenate([np.asarray(render_poses)] * reps,
                                    0)[:num_frames]
        path_intrinsics = [intrinsics[extras["imageid_to_viewid"][0]]
                           ] * num_frames
    elif fvr_args.camera_path == "adaptive_spiral":
        # spiral fitted to the trained scene (camera spread + scene bounds)
        # instead of the dataset's precomputed render_poses — the adaptive
        # path the reference leaves to the user (reference README.md:259-261)
        from nonrigid_nerf_tpu.data import adaptive_spiral_poses
        path_poses = adaptive_spiral_poses(poses[:, :3, :4], ds.near, ds.far,
                                           n_views=num_frames)
        path_intrinsics = [intrinsics[extras["imageid_to_viewid"][0]]
                           ] * num_frames
    elif fvr_args.camera_path == "time_interpolation":
        # slow-motion between captured time steps: linearly interpolate the
        # latent codes from a fixed camera (the reference documents this as
        # a recipe, free_viewpoint_rendering.py:547-562)
        num_frames = fvr_args.num_target_frames
        t = np.linspace(0.0, len(sub_latents) - 1, num_frames)
        lo = np.floor(t).astype(int)
        hi = np.ceil(t).astype(int)
        frac = (t - lo)[:, None]
        sub_latents = (sub_latents[hi] * frac
                       + sub_latents[lo] * (1.0 - frac)).astype(np.float32)
        sub_images = None   # no ground truth for interpolated frames
        fixed = fvr_args.fixed_view
        path_poses = np.tile(poses[fixed][None], (num_frames, 1, 1))
        path_intrinsics = [intrinsics[extras["imageid_to_viewid"][fixed]]
                           ] * num_frames
    else:
        raise ValueError("invalid --camera_path argument")

    # render all frames with the device-side surface extraction
    rgbs, disps, corr_rgbs, rigidities = [], [], [], []
    scripts = ckpt_extras.get("scripts_dict", {})
    if ("min_nerf_volume_point" in scripts
            and "max_nerf_volume_point" in scripts):
        min_pt = np.asarray(scripts["min_nerf_volume_point"])
        max_pt = np.asarray(scripts["max_nerf_volume_point"])
    else:
        # checkpoint predates the extent probe: recompute it like the
        # reference (free_viewpoint_rendering.py:171) so correspondence
        # colors stay meaningful instead of silently assuming [-1,1]^3
        print("volume extent missing from checkpoint; recomputing",
              flush=True)
        from nonrigid_nerf_tpu.utils.volume import \
            determine_nerf_volume_extent
        probe_intrinsics = [intrinsics[extras["imageid_to_viewid"][i]]
                            for i in range(poses.shape[0])]
        min_pt, max_pt = determine_nerf_volume_extent(
            params, cfg, rs, poses[:, :3, :4], probe_intrinsics)
    min_pt = min_pt.reshape(1, 1, 3)
    max_pt = max_pt.reshape(1, 1, 3)

    renderer_cache = {}
    for f in range(num_frames):
        intrin = path_intrinsics[f]
        H, W = int(intrin["height"]), int(intrin["width"])
        if (H, W) not in renderer_cache:
            # shards rays over all visible devices when there are several
            # (reference analog: DataParallel render wrapper, train.py:320-323)
            from nonrigid_nerf_tpu.parallel import make_auto_renderer
            renderer_cache[(H, W)] = make_auto_renderer(
                cfg, rs, edit=edit, chunk=args.chunk,
                detailed=True, postprocess=_surface_post, n_rays_hint=H * W)
        render_fn = renderer_cache[(H, W)]

        rays_o, rays_d = get_rays(
            jnp.asarray(np.asarray(path_poses[f])[:3, :4], jnp.float32),
            intrin)
        lat = jnp.broadcast_to(jnp.asarray(sub_latents[f]).reshape(1, -1),
                               (H * W, sub_latents.shape[-1]))
        out = render_fn(params, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
                        lat, None)
        rgbs.append(np.asarray(out["rgb_map"]).reshape(H, W, 3))
        disps.append(np.asarray(out["disp_map"]).reshape(H, W))

        surface = np.asarray(out["surface_points"]).reshape(H, W, 3)
        corr = (surface - min_pt) / (max_pt - min_pt)
        voxels = 100  # small-voxel checkerboard for visibility of motion
        corr = corr * voxels
        corr = corr - corr.astype(int)
        corr_rgbs.append(corr)
        if "surface_rigidity" in out:
            rigidities.append(
                np.asarray(out["surface_rigidity"]).reshape(H, W))

        # ray-bending line meshes: render a small random pixel subset with
        # full per-sample detail and write bent/not_bent/deltas OBJs
        # (reference closure: free_viewpoint_rendering.py:385,
        # run_nerf_helpers.py:794-915)
        if fvr_args.export_ray_bending_objs and cfg.use_ray_bending:
            from nonrigid_nerf_tpu.engine.render import make_ray_renderer
            from nonrigid_nerf_tpu.utils.viz import export_ray_bending_objs
            n_obj_rays = min(100, H * W)
            if "obj" not in renderer_cache:
                renderer_cache["obj"] = make_ray_renderer(
                    cfg, rs, edit=edit, chunk=n_obj_rays, detailed=True)
            idx = np.random.RandomState(0).choice(H * W, size=n_obj_rays,
                                                  replace=False)
            out_obj = renderer_cache["obj"](
                params, rays_o.reshape(-1, 3)[idx], rays_d.reshape(-1, 3)[idx],
                lat[idx], None)
            export_ray_bending_objs(
                np.asarray(out_obj["initial_input_pts"]),
                np.asarray(out_obj["input_pts"]),
                os.path.join(output_folder, f"ray_bending_{f:06d}"),
                subsample=n_obj_rays)
        print(f"rendered frame {f + 1}/{num_frames}", flush=True)

    rgbs = np.stack(rgbs)
    disps = np.stack(disps)
    corr_rgbs = np.stack(corr_rgbs)
    use_rigidity = len(rigidities) == num_frames

    # store per-frame images (reference: free_viewpoint_rendering.py:666-704)
    import imageio.v2 as imageio
    disp_max = max(float(disps.max()), 1e-10)
    for i in range(num_frames):
        post = f"_{i:06d}.png"
        imageio.imwrite(os.path.join(output_folder, "rgb" + post),
                        to8b(rgbs[i]))
        imageio.imwrite(os.path.join(output_folder, "correspondences" + post),
                        to8b(corr_rgbs[i]))
        raw_disp = disps[i] / max(float(disps[i].max()), 1e-10)
        imageio.imwrite(os.path.join(output_folder, "disp" + post),
                        to8b(raw_disp))
        imageio.imwrite(os.path.join(output_folder, "disp_jet" + post),
                        to8b(disparity_to_jet(raw_disp)))
        imageio.imwrite(os.path.join(output_folder, "disp_phong" + post),
                        to8b(disparity_to_blinn_phong(raw_disp)))
        if use_rigidity:
            imageio.imwrite(os.path.join(output_folder, "rigidity" + post),
                            to8b(rigidities[i]))
            imageio.imwrite(
                os.path.join(output_folder, "rigidity_jet" + post),
                to8b(disparity_to_jet(rigidities[i])))

    # videos (reference: free_viewpoint_rendering.py:706-768)
    fps = fvr_args.output_video_fps
    vp = os.path.join(output_folder, "video_")
    write_video(vp + "rgb.mp4", to8b(rgbs), fps)
    write_video(vp + "correspondences.mp4", to8b(corr_rgbs), fps)
    write_video(vp + "disp.mp4", to8b(disps / disp_max), fps)
    write_video(vp + "disp_jet.mp4",
                np.stack([to8b(disparity_to_jet(d / disp_max))
                          for d in disps]), fps)
    write_video(vp + "disp_phong.mp4",
                np.stack([to8b(disparity_to_blinn_phong(d / disp_max))
                          for d in disps]), fps)
    if use_rigidity:
        write_video(vp + "rigidity.mp4",
                    np.stack([to8b(r) for r in rigidities]), fps)
        write_video(vp + "rigidity_jet.mp4",
                    np.stack([to8b(disparity_to_jet(r))
                              for r in rigidities]), fps)

    # background stability (reference: free_viewpoint_rendering.py:771-785)
    if fvr_args.camera_path == "fixed":
        std = 10.0 * np.mean(np.std(rgbs, axis=0), axis=-1)
        imageio.imwrite(
            os.path.join(output_folder, "standard_deviations.png"),
            to8b(disparity_to_jet(np.clip(std, 0.0, 1.0))))
        # the reference only visualizes; also persist the scalar so runs
        # are comparable (lower = more stable background)
        with open(os.path.join(output_folder,
                               "background_stability.json"), "w") as f:
            json.dump({"mean_10x_std": float(np.mean(std)),
                       "max_10x_std": float(np.max(std)),
                       "num_frames": int(len(rgbs)),
                       "fixed_view": int(fvr_args.fixed_view)}, f, indent=2)

    # quantitative evaluation
    # (reference: free_viewpoint_rendering.py:787-876)
    if fvr_args.camera_path == "input_reconstruction":
        naive_folder = os.path.join(output_folder, "naive_errors")
        ssim_folder = os.path.join(output_folder, "ssim_errors")
        create_folder(naive_folder)
        create_folder(ssim_folder)

        # undistortion can leave masked-out black pixels in groundtruth
        mask = np.sum(sub_images[0], axis=-1) == 0.0
        if mask.all():
            # degenerate (fully black first frame) — don't mask anything
            mask = np.zeros_like(mask)
        scores = {}
        lpips_missing = False
        for i in range(num_frames):
            gt = sub_images[i].copy()
            gen = rgbs[i].copy()
            gt[mask] = 0.0
            gen[mask] = 0.0

            ssim_val, ssim_map = ssim(gt, gen, full=True)
            lp = lpips_distance(gt, gen)
            if lp is None:
                # no weights available: record null, NEVER a fake number
                lpips_missing = True
            scores[i] = {"psnr": psnr(gt, gen), "ssim": ssim_val,
                         "lpips": lp}

            error = np.linalg.norm(gt - gen, axis=-1) / np.sqrt(3.0)
            error = np.clip(error * 10.0, 0.0, 1.0)
            imageio.imwrite(os.path.join(naive_folder, f"error_{i:03d}.png"),
                            to8b(disparity_to_jet(error)))
            ssim_err = 1.0 - np.mean(ssim_map, axis=-1)
            imageio.imwrite(os.path.join(ssim_folder, f"error_{i:03d}.png"),
                            to8b(disparity_to_jet(ssim_err)))

        lpips_vals = [s["lpips"] for s in scores.values()
                      if s["lpips"] is not None]
        averaged = {
            "average_psnr": float(np.mean([s["psnr"]
                                           for s in scores.values()])),
            "average_ssim": float(np.mean([s["ssim"]
                                           for s in scores.values()])),
            "average_lpips": (float(np.mean(lpips_vals))
                              if lpips_vals else None),
            "lpips_available": not lpips_missing,
        }
        if lpips_missing:
            from nonrigid_nerf_tpu.utils.lpips_jax import lpips_available
            if lpips_available():
                print("LPIPS weights are installed but the evaluation "
                      "images are too small for the AlexNet trunk (~31 px "
                      "per side minimum); lpips is reported as null.")
            else:
                print("LPIPS weights not found; lpips is reported as null "
                      "(lpips_available: false). Generate "
                      "data/lpips_alex.npz once with "
                      "tools/convert_lpips_weights.py (or pip install "
                      "lpips) for real values.")
        print(averaged, flush=True)
        scores.update(averaged)
        with open(os.path.join(output_folder, "scores.json"), "w") as f:
            json.dump(scores, f, indent=4)

    print("output written to", output_folder, flush=True)
    return output_folder


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True,
                        help="experiment folder created by train.py")
    parser.add_argument("--deformations", type=str, required=True,
                        choices=["train", "test", "all"])
    parser.add_argument("--camera_path", type=str, required=True,
                        choices=["input_reconstruction", "fixed", "spiral",
                                 "adaptive_spiral", "time_interpolation"])
    parser.add_argument("--fixed_view", type=int, default=0)
    parser.add_argument("--forced_background_stabilization", type=float,
                        default=None)
    parser.add_argument("--motion_factor", type=float, default=None)
    parser.add_argument("--foreground_removal", type=float, default=None)
    parser.add_argument("--render_canonical", action="store_true")
    parser.add_argument("--export_ray_bending_objs", action="store_true",
                        help="per frame, write bent/not_bent/deltas OBJ line "
                             "meshes of 100 random rays (reference: "
                             "visualize_ray_bending)")
    parser.add_argument("--output_video_fps", type=int, default=5)
    parser.add_argument("--num_target_frames", type=int, default=120,
                        help="frame count for time_interpolation paths")
    parser.add_argument("--view_stride", type=int, default=1,
                        help="render/evaluate every k-th frame of the "
                             "deformation subset (TPU-native extra for "
                             "large datasets; output folder gains a "
                             "_stride{k} suffix when > 1)")
    parser.add_argument("--quantize_inference", action="store_true",
                        help="EXPERIMENTAL: render through the int8 MXU "
                             "kernel (post-training calibration on this "
                             "scene's rays). Quality-neutral but measured "
                             "SLOWER than the default path on v5e "
                             "(requantization is VPU-bound); see "
                             "ops/pallas/quant_mlp.py")
    return parser


if __name__ == "__main__":
    free_viewpoint_rendering(build_parser().parse_args())
