#!/usr/bin/env python
"""NR-NeRF training CLI.

Usage mirrors the reference: `python train.py --config configs/<scene>.txt`
(reference: train.py:2004-2016). Every flag of the reference's config_parser
(train.py:983-1219) is accepted on the command line or in the config file.

Orchestration per the reference main_function (train.py:1325-1953): load
data -> dump args.txt/config.txt -> snapshot the code into backup/ -> build
model + optimizer -> auto-resume -> volume extent probe (cameras.obj) ->
train loop with periodic checkpoints / spiral videos / test-set renders.

The hot loop itself is the fused jitted step from
nonrigid_nerf_tpu.engine.train_step (multi-device via parallel.mesh when
more than one device is visible).
"""

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))

from nonrigid_nerf_tpu import config as cfg_mod
from nonrigid_nerf_tpu.config import (Args, DEFAULTS,
                                      model_config_from_args,
                                      parse_config_file,
                                      render_settings_from_args,
                                      train_config_from_args)


def config_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native NR-NeRF training")
    parser.add_argument("--config", type=str, default=None,
                        help="config file path (key = value lines)")
    for key, default in DEFAULTS.items():
        if key == "config":
            continue
        if key in cfg_mod._BOOL_KEYS:
            parser.add_argument(f"--{key}", dest=key, default=None,
                                action="store_true")
            # bools that default to True need an explicit off switch
            parser.add_argument(f"--no_{key}", dest=key, default=None,
                                action="store_false")
        elif key in cfg_mod._INT_KEYS:
            parser.add_argument(f"--{key}", type=int, default=None)
        elif key in cfg_mod._FLOAT_KEYS:
            parser.add_argument(f"--{key}", type=float, default=None)
        else:
            parser.add_argument(f"--{key}", type=str, default=None)
    return parser


def parse_args(argv=None) -> Args:
    ns = config_parser().parse_args(argv)
    values = {}
    config_path = ns.config
    if config_path is None:
        default_cfg = cfg_mod.default_config_path()
        if os.path.exists(default_cfg):
            config_path = default_cfg
    if config_path is not None:
        values.update(parse_config_file(config_path))
        values["config"] = config_path
    for key, val in vars(ns).items():
        if key != "config" and val is not None:
            values[key] = val
    return Args(**values)


def create_folder(folder):
    os.makedirs(folder, exist_ok=True)


def backup(results_folder: str) -> None:
    """Snapshot the framework source + default config into backup/ so the
    experiment is self-contained (reference: train.py:1962-2001); inference
    imports this snapshot (reference: free_viewpoint_rendering.py:18-30)."""
    print("backing up... ", flush=True, end="")
    this_folder = os.path.dirname(os.path.realpath(__file__))
    backup_folder = os.path.join(results_folder, "backup")
    create_folder(backup_folder)

    for fname in ("train.py", "free_viewpoint_rendering.py", "preprocess.py",
                  "bench.py", "configs/default.txt"):
        src = os.path.join(this_folder, fname)
        if os.path.exists(src):
            dst = os.path.join(backup_folder, fname)
            create_folder(os.path.dirname(dst))
            shutil.copyfile(src, dst)

    for root, _, files in os.walk(os.path.join(this_folder,
                                               "nonrigid_nerf_tpu")):
        rel = os.path.relpath(root, this_folder)
        if "__pycache__" in rel:
            continue
        for f in files:
            if f.endswith(".py"):
                dst_dir = os.path.join(backup_folder, rel)
                create_folder(dst_dir)
                shutil.copyfile(os.path.join(root, f),
                                os.path.join(dst_dir, f))
    print("done.", flush=True)


def load_dataset(args: Args):
    """Data loading + mappings + intrinsics + split + bounds
    (reference: main_function setup, train.py:1336-1430)."""
    from nonrigid_nerf_tpu.data import (block_train_test_split,
                                        build_ray_dataset, get_intrinsics,
                                        get_multi_view_mappings,
                                        load_llff_data,
                                        load_llff_data_multi_view)
    if args.dataset_type != "llff":
        raise ValueError(f"Unknown dataset type {args.dataset_type}")

    datadir = args.datadir
    multi_view = os.path.exists(
        os.path.join(datadir, "image_to_camera_id_and_timestep.json"))
    loader = load_llff_data_multi_view if multi_view else load_llff_data
    images, poses, bds, render_poses, _ = loader(datadir, factor=args.factor)
    extras = get_multi_view_mappings(images.shape[0], datadir)
    hwf = poses[0, :3, 4]
    # multi-view calibration.json stores FULL-resolution focal/center values;
    # divide them by args.factor to match the downsampled images (reference:
    # train.py:1354-1366). The monocular branch is factor-invariant: its
    # focal comes from hwf, which the loader already rescaled.
    intrinsics = get_intrinsics(
        datadir, extras, images, hwf, factor=args.factor,
        ray_bending_latent_size=args.ray_bending_latent_size)

    i_train, i_test = block_train_test_split(
        len(extras["raw_timesteps"]), extras["imageid_to_timestepid"],
        args.train_block_size, args.test_block_size)

    near = float(np.min(bds)) * 0.9
    far = float(np.max(bds))
    print(f"Loaded llff {images.shape} near={near:.4f} far={far:.4f} "
          f"{'multi-view' if multi_view else 'monocular'}")
    print("TRAIN views are", i_train)
    print("TEST views are", i_test)

    ds = build_ray_dataset(images, poses[:, :3, :4], intrinsics, extras,
                           i_train, i_test, near, far)
    return ds, images, poses, render_poses, intrinsics, extras, i_train, i_test


def _write_videos(moviebase: str, rgbs: np.ndarray, disps: np.ndarray) -> None:
    """The reference's four-video artifact set at an i_video checkpoint
    (reference: train.py:1736-1781): rgb, disp (globally normalized),
    disp_jet and disp_phong (both normalized PER FRAME, matching the
    reference's `disp / np.max(disp)` inside the frame loop)."""
    from nonrigid_nerf_tpu.ops.math import to8b
    from nonrigid_nerf_tpu.utils.viz import (disparity_to_blinn_phong,
                                             disparity_to_jet)
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(moviebase + "rgb.mp4", to8b(rgbs), fps=30, quality=8)
        imageio.mimwrite(moviebase + "disp.mp4",
                         to8b(disps / np.max(disps)), fps=30, quality=8)
        imageio.mimwrite(
            moviebase + "disp_jet.mp4",
            to8b(np.stack([disparity_to_jet(d / np.max(d))
                           for d in disps])), fps=30, quality=8)
        imageio.mimwrite(
            moviebase + "disp_phong.mp4",
            to8b(np.stack([disparity_to_blinn_phong(d / np.max(d))
                           for d in disps])), fps=30, quality=8)
    except Exception as e:
        print("video write failed (ffmpeg missing?):", e)


def main_function(args: Args) -> None:
    # multi-host bring-up must precede the first jax backend use
    from nonrigid_nerf_tpu.parallel import multihost
    n_procs = multihost.maybe_initialize()
    main = multihost.is_main()

    import jax
    import jax.numpy as jnp

    from nonrigid_nerf_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(getattr(args, "compilation_cache_dir", None))

    if getattr(args, "checkpoint_format", "npz") not in ("npz", "orbax"):
        raise ValueError(
            f"--checkpoint_format must be 'npz' or 'orbax', got "
            f"{args.checkpoint_format!r}")

    from nonrigid_nerf_tpu.apps.render_path import (downscale_intrinsics,
                                                    render_path)
    from nonrigid_nerf_tpu.checkpoints import (latest_checkpoint,
                                               load_checkpoint,
                                               restore_opt_state,
                                               save_checkpoint)
    from nonrigid_nerf_tpu.engine.train_state import (TrainState,
                                                      create_train_state)
    from nonrigid_nerf_tpu.engine.train_step import make_train_step
    from nonrigid_nerf_tpu.ops.math import to8b
    from nonrigid_nerf_tpu.ops.rays import get_rays
    from nonrigid_nerf_tpu.parallel import (make_mesh,
                                            make_parallel_train_step)
    from nonrigid_nerf_tpu.utils.volume import determine_nerf_volume_extent

    if args.debug:
        jax.config.update("jax_debug_nans", True)

    # seed=-1 -> fresh random seed, resolved BEFORE args.txt is dumped so the
    # run is reproducible after the fact
    args = cfg_mod.resolve_seed(args)

    (ds, images, poses, render_poses, intrinsics, extras,
     i_train, i_test) = load_dataset(args)

    logdir = os.path.join(args.rootdir, args.expname, "logs")
    if main:
        create_folder(logdir)
        args.dump(os.path.join(logdir, "args.txt"))
        if args.config is not None and os.path.exists(args.config):
            shutil.copyfile(args.config, os.path.join(logdir, "config.txt"))

    cfg = model_config_from_args(args)
    tc = train_config_from_args(args)
    rs = render_settings_from_args(args, ds.near, ds.far)

    state = create_train_state(
        jax.random.PRNGKey(tc.seed), cfg, tc, ds.num_timesteps)

    # auto-resume (reference: train.py:666-694)
    start = 0
    ckpt_path = args.ft_path or latest_checkpoint(logdir)
    if ckpt_path and not args.no_reload and os.path.exists(ckpt_path):
        print("Reloading from", ckpt_path)
        start, params, opt_tree, _ = load_checkpoint(ckpt_path)
        opt_state = restore_opt_state(state.opt_state, opt_tree) \
            if opt_tree is not None else state.opt_state
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.asarray(start, jnp.int32))

    # volume extent probe + cameras.obj (reference: train.py:1485-1489)
    probe_intrinsics = [intrinsics[extras["imageid_to_viewid"][i]]
                        for i in range(poses.shape[0])]
    min_point, max_point = determine_nerf_volume_extent(
        state.params, cfg, rs, poses[:, :3, :4], probe_intrinsics,
        output_folder=logdir if main else None)
    scripts_dict = {"near": ds.near, "far": ds.far,
                    "min_nerf_volume_point": min_point.tolist(),
                    "max_nerf_volume_point": max_point.tolist(),
                    "image_folder": "images"}

    n_devices = len(jax.devices())   # GLOBAL count under multi-host
    has_test_split = len(i_test) > 0
    key = jax.random.PRNGKey(tc.seed + 1)
    if n_devices > 1:
        mesh = make_mesh()
        step_fn = make_parallel_train_step(cfg, tc, rs, mesh, has_test_split,
                                           debug_metrics=args.debug)
        if n_procs > 1:
            # multi-controller: replicated jit inputs must be global arrays
            state, ds, key = multihost.replicate((state, ds, key), mesh)
        print(f"data-parallel training over {n_devices} devices"
              + (f" on {n_procs} hosts" if n_procs > 1 else ""))
    else:
        n_pref = int(getattr(args, "sampling_prefetch", -1))
        if n_pref < 0:  # auto: amortize the per-call big-argument cost the
            # tunneled runtime charges for the image stack (see
            # engine/train_step.py make_prefetch_train_step) on large stacks
            n_pref = 64 if ds.images.nbytes >= 256 * 1024 * 1024 else 0
        if n_pref > 1:
            from nonrigid_nerf_tpu.engine.train_step import \
                make_prefetch_train_step
            presample_fn, batch_step_fn = make_prefetch_train_step(
                cfg, tc, rs, has_test_split, n_prefetch=n_pref,
                debug_metrics=args.debug)
            print(f"presampled training: {n_pref} batches per stack pass")
            _pref = {"base": -(10 ** 9), "batches": None,
                     "next_step": int(state.step)}

            def step_fn(state, ds, key):
                s = _pref["next_step"]   # host mirror of state.step —
                # avoids a per-step device fetch just for indexing
                if not _pref["base"] <= s < _pref["base"] + n_pref:
                    _pref["base"] = s
                    _pref["batches"] = presample_fn(ds, key, np.int32(s))
                out = batch_step_fn(state, _pref["batches"],
                                    np.int32(s - _pref["base"]), key)
                _pref["next_step"] = s + 1
                return out
        else:
            step_fn = make_train_step(cfg, tc, rs, has_test_split,
                                      debug_metrics=args.debug)

    def checkpoint_extras():
        return {
            "intrinsics": {str(k): {kk: vv for kk, vv in v.items()}
                           for k, v in intrinsics.items()},
            "scripts_dict": scripts_dict,
            "dataset_extras": {
                k: v for k, v in extras.items()
                if isinstance(v, (list, bool, int, float, str))},
        }

    # periodic validation-image rendering (the reference parses i_img but its
    # TF-summary consumer is dead code, train.py:1910-1950; here it renders
    # one held-out — or first training — view every i_img steps)
    def host_params():
        """Pull (replicated) params to host numpy for process-local
        rendering under multi-host; pass-through otherwise."""
        if n_procs > 1:
            return jax.tree_util.tree_map(np.asarray, state.params)
        return state.params

    val_renderer = None
    val_view = None
    if args.i_img and args.i_img > 0 and main:
        from nonrigid_nerf_tpu.parallel import make_auto_renderer
        val_id = int(i_test[0]) if len(i_test) > 0 else int(i_train[0])
        val_intrin = downscale_intrinsics(
            [intrinsics[extras["imageid_to_viewid"][val_id]]],
            args.render_factor)[0]
        vh, vw = int(val_intrin["height"]), int(val_intrin["width"])
        val_renderer = make_auto_renderer(
            cfg, rs.test_mode(), chunk=args.chunk, n_rays_hint=vh * vw)
        val_view = (val_id, val_intrin)
        create_folder(os.path.join(logdir, "val_images"))

    print(f"Begin training at step {start} -> {args.N_iters}", flush=True)

    metrics_path = os.path.join(logdir, "metrics.jsonl") \
        if getattr(args, "metrics_file", True) and main else None
    profile_steps = int(getattr(args, "profile_steps", 0) or 0)
    profile_dir = os.path.join(logdir, "profile")

    t0 = time.time()
    metrics = None
    for i in range(start + 1, args.N_iters + 1):
        if profile_steps and i == start + 50:
            # skip the compile/warmup steps, then trace a window
            jax.profiler.start_trace(profile_dir)
        state, metrics = step_fn(state, ds, key)
        if profile_steps and i == start + 50 + profile_steps:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            print("wrote XLA trace to", profile_dir, flush=True)
            profile_steps = 0

        if i % args.i_print == 0 and main:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            t0 = time.time()
            parts = [f"[TRAIN] Iter: {i}",
                     f"Loss: {m['loss']:.5f}", f"PSNR: {m['psnr']:.2f}"]
            if "img_loss0" in m:
                parts.append(f"coarse: {m['img_loss0']:.5f}")
            if "offsets_loss" in m:
                parts.append(f"offsets: {m['offsets_loss']:.6f}")
            if "divergence_loss" in m:
                parts.append(f"div: {m['divergence_loss']:.6f}")
            if "grad_norm" in m:
                parts.append(f"|grad|: {m['grad_norm']:.5f}")
            parts.append(f"({args.i_print / dt:.1f} it/s)")
            print(" ".join(parts), flush=True)
            if metrics_path:
                import json as _json
                with open(metrics_path, "a") as mf:
                    mf.write(_json.dumps(
                        {"step": i, "it_per_sec": args.i_print / dt,
                         **{k: round(v, 8) for k, v in m.items()}}) + "\n")

        if val_renderer is not None and i % args.i_img == 0:
            val_id, intrin = val_view
            vh, vw = int(intrin["height"]), int(intrin["width"])
            rays_o, rays_d = get_rays(
                jnp.asarray(poses[val_id][:3, :4], jnp.float32), intrin)
            vparams = host_params()
            lat = jnp.broadcast_to(
                jnp.asarray(vparams["latents"])[
                    extras["imageid_to_timestepid"][val_id]].reshape(1, -1),
                (vh * vw, state.params["latents"].shape[-1]))
            out = val_renderer(vparams, rays_o.reshape(-1, 3),
                               rays_d.reshape(-1, 3), lat)
            rgb = np.asarray(out["rgb_map"]).reshape(vh, vw, 3)
            gt = images[val_id]
            if args.render_factor:
                gt = gt[::args.render_factor, ::args.render_factor][:vh, :vw]
            val_psnr = float(-10.0 * np.log10(np.mean((gt - rgb) ** 2)))
            try:
                import imageio.v2 as imageio
                imageio.imwrite(os.path.join(
                    logdir, "val_images", f"{i:06d}.png"), to8b(rgb))
            except Exception as e:
                print("val image write failed:", e)
            print(f"[VAL] Iter: {i} view {val_id} PSNR: {val_psnr:.2f}",
                  flush=True)
            if metrics_path:
                import json as _json
                with open(metrics_path, "a") as mf:
                    mf.write(_json.dumps(
                        {"step": i, "val_view": val_id,
                         "val_psnr": round(val_psnr, 4)}) + "\n")

        if i % args.i_weights == 0 and main:
            ext = getattr(args, "checkpoint_format", "npz")
            if i % 50000 == 0:
                path = os.path.join(logdir, f"{i:06d}.{ext}")
            else:
                path = os.path.join(logdir, f"latest.{ext}")
            save_checkpoint(path, i, state.params, state.opt_state,
                            checkpoint_extras())
            if f"{i:06d}" in os.path.basename(path):
                latest = os.path.join(logdir, f"latest.{ext}")
                if ext == "npz":
                    shutil.copyfile(path, latest)
                else:  # directory-backed formats: just save again
                    save_checkpoint(latest, i, state.params,
                                    state.opt_state, checkpoint_extras())
            print("Saved checkpoint at", path, flush=True)

        if getattr(args, "die_at_step", 0) and i == args.die_at_step \
                and start == 0:
            # fault injection (crash-recovery testing): die WITHOUT any
            # cleanup, exactly like a preemption/OOM kill would. Only a
            # FRESH run fires — a resumed run passing the step again (when
            # die_at_step isn't checkpoint-aligned) must not re-die, or the
            # experiment could never complete.
            import signal
            print(f"[FAULT-INJECTION] SIGKILL at step {i}", flush=True)
            os.kill(os.getpid(), signal.SIGKILL)

        if i % args.i_video == 0 and i > 0 and len(render_poses) > 0 \
                and len(i_test) > 0 and not extras["is_multiview"] and main:
            print("rendering video...", flush=True)
            video_params = host_params()
            latents_np = np.asarray(video_params["latents"])
            if args.render_test:
                frame_latents = np.stack(
                    [latents_np[extras["imageid_to_timestepid"][j]]
                     for j in i_test])
                video_poses = poses[i_test]
            else:
                frame_latents = np.tile(
                    latents_np[extras["imageid_to_timestepid"][i_test[0]]],
                    (len(render_poses), 1))
                video_poses = render_poses
            rgbs, disps = render_path(
                video_params, cfg, rs, video_poses[:, :3, :4],
                [intrinsics[0]] * len(video_poses), frame_latents,
                chunk=args.chunk, render_factor=args.render_factor)
            _write_videos(
                os.path.join(logdir, f"{args.expname}_spiral_{i:06d}_"),
                rgbs, disps)

            # end-of-training full-training-set render (reference:
            # train.py:1782-1850, gated on the LAST i_video interval)
            if i >= args.N_iters + 1 - args.i_video:
                print("rendering full training set...", flush=True)
                latents_np = np.asarray(video_params["latents"])
                rgbs, disps = render_path(
                    video_params, cfg, rs, poses[i_train][:, :3, :4],
                    [intrinsics[extras["imageid_to_viewid"][j]]
                     for j in i_train],
                    np.stack([latents_np[extras["imageid_to_timestepid"][j]]
                              for j in i_train]),
                    chunk=args.chunk, render_factor=args.render_factor)
                _write_videos(
                    os.path.join(logdir, f"{args.expname}_training_{i:06d}_"),
                    rgbs, disps)

        if i % args.i_testset == 0 and i > 0 and main:
            trainsubsavedir = os.path.join(logdir, f"trainsubset_{i:06d}")
            create_folder(trainsubsavedir)
            i_train_sub = i_train
            if len(i_test) > 0 and i < args.N_iters + 1 - args.i_video:
                stride = max(1, int(len(i_train_sub) / max(len(i_test), 1)
                                    + 0.5))
                i_train_sub = i_train_sub[::stride]
            test_params = host_params()
            latents_np = np.asarray(test_params["latents"])

            def latents_for(ids):
                return np.stack(
                    [latents_np[extras["imageid_to_timestepid"][j]]
                     for j in ids])

            render_path(
                test_params, cfg, rs, poses[i_train_sub][:, :3, :4],
                [intrinsics[extras["imageid_to_viewid"][j]]
                 for j in i_train_sub],
                latents_for(i_train_sub), chunk=args.chunk,
                gt_imgs=images[i_train_sub], savedir=trainsubsavedir,
                render_factor=args.render_factor)
            print("Saved some training images", flush=True)

            if len(i_test) > 0:
                testsavedir = os.path.join(logdir, f"testset_{i:06d}")
                create_folder(testsavedir)
                render_path(
                    test_params, cfg, rs, poses[i_test][:, :3, :4],
                    [intrinsics[extras["imageid_to_viewid"][j]]
                     for j in i_test],
                    latents_for(i_test), chunk=args.chunk,
                    gt_imgs=images[i_test], savedir=testsavedir,
                    render_factor=args.render_factor)
                print("Saved test set", flush=True)

    # final checkpoint
    if metrics is not None and main:
        ext = getattr(args, "checkpoint_format", "npz")
        save_checkpoint(os.path.join(logdir, f"latest.{ext}"), args.N_iters,
                        state.params, state.opt_state, checkpoint_extras())
        print(f"training done at step {int(state.step)}; final loss "
              f"{float(metrics['loss']):.5f}", flush=True)
        # device-memory high-water mark (scale-envelope evidence: the
        # uint8 image stack + rays live in HBM by design, data/dataset.py)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            row = {"step": int(state.step)}
            if peak is not None:
                print(f"peak device memory: {peak / 2**30:.2f} GiB "
                      f"(in use now: "
                      f"{stats.get('bytes_in_use', 0) / 2**30:.2f} GiB)",
                      flush=True)
                row["peak_device_bytes"] = int(peak)
            else:
                # tunneled/virtual platforms report no allocator stats;
                # fall back to the live device working set (dominated by
                # the resident uint8 image stack + per-pixel ray tables,
                # data/dataset.py — XLA step temporaries come on top)
                live = sum(int(a.nbytes) for a in jax.live_arrays())
                print(f"live device arrays at end of training: "
                      f"{live / 2**30:.2f} GiB "
                      f"(allocator peak stats unavailable here)", flush=True)
                row["live_device_bytes"] = live
            if metrics_path and len(row) > 1:
                import json as _json
                with open(metrics_path, "a") as mf:
                    mf.write(_json.dumps(row) + "\n")
        except Exception as e:  # noqa: BLE001 - stats are best-effort
            print("device memory stats unavailable:", e)


if __name__ == "__main__":
    args = parse_args()
    results_folder = os.path.join(args.rootdir, args.expname)
    print(results_folder, flush=True)

    from nonrigid_nerf_tpu.parallel import multihost
    multihost.maybe_initialize()
    if multihost.is_main():
        create_folder(results_folder)
        if args.no_reload:
            shutil.rmtree(results_folder)
            create_folder(results_folder)
        backup(results_folder)
    # other processes must not race past the wipe/backup
    multihost.barrier("experiment_folder_ready")
    main_function(args)
