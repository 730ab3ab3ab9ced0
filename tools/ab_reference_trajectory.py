"""Long-horizon training-trajectory A/B against the actual PyTorch reference.

Closes the last open parity item (ROADMAP "A/B against the actual PyTorch
reference ... for long-horizon trajectory parity beyond 3 steps"): the
one-step and 3-step tests (tests/test_reference_e2e.py) pin losses,
gradients, and the optimizer loop; this tool trains BOTH frameworks for
hundreds-to-thousands of real optimization steps on the real
`example_sequence` images and compares the trajectories.

Protocol:
  * identical data: a frame subset of /root/reference/data/example_sequence
    downsampled by --factor (area mean), poses/bounds from precomputed.json,
    rays precomputed once with our parity-tested `get_rays_np` equivalent
    and fed to both sides;
  * identical initialization: the reference's `create_nerf` init
    (reference train.py:556-721, Kaiming + zero-init final bender layers,
    zero latent codes) copied leaf-by-leaf into the JAX param tree;
  * identical batches: one numpy RNG draws the (image, x, y) pixel batch of
    every step, consumed by both sides (the reference samples this way on
    the host, train.py:1546-1553; our production sampler is on-device, so
    the jitted step is driven with `sample_ray_batch` replaced by the
    shared batch — batch-content parity is separately pinned by
    tests/test_train_step.py);
  * deterministic math: perturb=0, raw_noise_std=0, and (by default) the
    EXACT divergence estimator on both sides, so the two trajectories are
    comparable step-by-step until fp32 accumulation chaos separates them;
  * torch runs its genuine loop: training_wrapper_class forward, backward,
    torch Adam, and the reference's post-step LR update with the
    pre-increment global step (reference train.py:1631-1643,1952). Ours is
    the production jitted `train_step`.

Reported: per-step total loss for both sides, PSNR on a fixed probe ray set
every --eval_every steps, the max relative loss gap over the early
(pre-chaos) window, and the final probe-PSNR gap. Artifacts (JSON + PNG +
README) land in --out.

Both sides run on CPU (JAX_PLATFORMS=cpu is set before jax imports) so the
comparison is backend-symmetric; this is a parity tool, not a benchmark.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Area-mean downsample of an (H, W, 3) float image."""
    H, W, C = img.shape
    assert H % factor == 0 and W % factor == 0, (H, W, factor)
    return img.reshape(H // factor, factor, W // factor, factor, C).mean(
        axis=(1, 3))


def load_example_subset(factor: int, num_frames: int):
    """Frame subset of example_sequence: images in [0,1], c2w poses,
    per-frame intrinsics at the downsampled resolution, near/far."""
    import imageio.v2 as imageio
    data_dir = os.path.join(REPO, "..", "reference", "data",
                            "example_sequence")
    data_dir = os.path.abspath(data_dir)
    with open(os.path.join(data_dir, "precomputed.json")) as f:
        pre = json.load(f)
    poses = np.asarray(pre["poses"], np.float32)          # (86, 3, 5)
    bds = np.asarray(pre["bds"], np.float32)              # (86, 2)
    files = sorted(os.listdir(os.path.join(data_dir, "images")))
    sel = np.linspace(0, len(files) - 1, num_frames).round().astype(int)

    images = np.stack([
        downsample(np.asarray(
            imageio.imread(os.path.join(data_dir, "images", files[i])),
            np.float32) / 255.0, factor)
        for i in sel])                                    # (F, h, w, 3)

    H_full, W_full, focal_full = poses[0, :, 4]
    intrin = {
        "height": images.shape[1], "width": images.shape[2],
        "focal_x": float(focal_full) / factor,
        "focal_y": float(focal_full) / factor,
        "center_x": (W_full / factor) * 0.5,
        "center_y": (H_full / factor) * 0.5,
    }
    c2w = poses[sel, :3, :4]                              # (F, 3, 4)
    # reference main_function: near = bds.min()*0.9, far = bds.max()
    # (reference train.py:1419-1420), over the full sequence
    near = float(bds.min()) * 0.9
    far = float(bds.max())
    return images, c2w, intrin, near, far


def load_multiview_dataset(datadir: str):
    """A calibration.json multi-view rig (reference: load_llff.py:36-73 +
    train.py:1222-1322): per-image poses from per-camera extrinsics,
    per-VIEW intrinsics, image->timestep mapping (latents are shared across
    views within a timestep), bounds from the calibration file."""
    from nonrigid_nerf_tpu.data import (get_intrinsics,
                                        get_multi_view_mappings,
                                        load_llff_data_multi_view)
    images, poses, bds, _, _ = load_llff_data_multi_view(datadir, factor=1)
    extras = get_multi_view_mappings(len(images), datadir)
    intrin = get_intrinsics(datadir, extras, images, poses[0, :, 4])
    per_image_intrin = [intrin[extras["imageid_to_viewid"][i]]
                        for i in range(len(images))]
    img2t = np.asarray(extras["imageid_to_timestepid"])
    near = float(bds.min()) * 0.9
    far = float(bds.max())
    return (images.astype(np.float32), poses[:, :3, :4], per_image_intrin,
            near, far, img2t)


def precompute_rays(c2w: np.ndarray, intrin) -> np.ndarray:
    """(F, h, w, 2, 3) ray origins+directions via the package's ray op.
    `intrin` is one shared dict (monocular) or a per-image list (multiview)."""
    from nonrigid_nerf_tpu.ops.rays import get_rays
    if isinstance(intrin, dict):
        intrin = [intrin] * len(c2w)
    grids = []
    for pose, cam in zip(c2w, intrin):
        ro, rd = get_rays(pose, cam)
        grids.append(np.stack([np.asarray(ro), np.asarray(rd)], axis=2))
    return np.stack(grids)


def make_batch(rng: np.random.RandomState, rays: np.ndarray,
               images: np.ndarray, n_rand: int, frame_pool=None):
    F, h, w = images.shape[:3]
    pool = np.arange(F) if frame_pool is None else np.asarray(frame_pool)
    img = pool[rng.randint(0, len(pool), size=n_rand)]
    x = rng.randint(0, w, size=n_rand)
    y = rng.randint(0, h, size=n_rand)
    ro = rays[img, y, x, 0]
    rd = rays[img, y, x, 1]
    target = images[img, y, x]
    return img, ro.astype(np.float32), rd.astype(np.float32), \
        target.astype(np.float32)


# ---------------------------------------------------------------------------
# torch (reference) side
# ---------------------------------------------------------------------------

def build_reference_side(steps_args: argparse.Namespace, num_latents: int,
                         near: float, far: float, workdir: str):
    import torch
    from tests.test_reference_e2e import (load_ref_train_module,
                                          make_ref_args)
    ref_train = load_ref_train_module()
    args = make_ref_args(
        workdir,
        N_samples=steps_args.n_samples, N_importance=steps_args.n_importance,
        N_rand=steps_args.n_rand, chunk=1 << 17, netchunk=1 << 19,
        use_viewdirs=steps_args.use_viewdirs,
        approx_nonrigid_viewdirs=not steps_args.exact_viewdirs,
        expname="ab_ref")
    torch.manual_seed(steps_args.seed)
    # one latent per TIMESTEP (== per frame only in the monocular case;
    # reference: train.py:1447-1453)
    latents = [torch.zeros(args.ray_bending_latent_size, requires_grad=True)
               for _ in range(num_latents)]
    (rk_train, rk_test, start, grad_vars, optimizer) = ref_train.create_nerf(
        args, latents, ignore_optimizer=False)
    rk_train.update({"near": near, "far": far})

    restore = []
    if steps_args.divergence == "exact":
        import run_nerf_helpers as ref_helpers
        orig = ref_helpers.divergence_approx
        restore.append(
            lambda: setattr(ref_helpers, "divergence_approx", orig))
        ref_helpers.divergence_approx = ref_helpers.divergence_exact

    return ref_train, args, rk_train, latents, optimizer, restore


def torch_step(ref_train, args, rk_train, latents, optimizer, wrapper,
               batch, global_step: int, img2t: np.ndarray,
               test_frame_mask=None):
    import torch
    img, ro, rd, target = batch
    pix = torch.tensor(
        np.stack([img, np.zeros_like(img), np.zeros_like(img)], -1),
        dtype=torch.long)
    optimizer.zero_grad()
    for latent in latents:
        latent.grad = None
    losses = wrapper(
        args, torch.tensor(ro), torch.tensor(rd), global_step, rk_train,
        torch.tensor(target), global_step, 0,
        {"imageid_to_timestepid": [int(t) for t in img2t]}, pix)
    loss = losses.mean()
    if test_frame_mask is not None and test_frame_mask.any():
        # the reference's two-phase backward (reference train.py:1594-1608):
        # test-image rays first (latents only, wipe network grads), then
        # training rays
        test_ind = torch.tensor(test_frame_mask[img].astype(np.float64
                                if losses.dtype == torch.float64
                                else np.float32))
        train_ind = 1.0 - test_ind
        if torch.sum(test_ind) > 0:
            (test_ind * losses).mean().backward(retain_graph=True)
            for w in (list(rk_train["network_fn"].parameters())
                      + list(rk_train["network_fine"].parameters())
                      + list(rk_train["ray_bender"].parameters())):
                w.grad = None
        (train_ind * losses).mean().backward()
        # report the train-masked mean, matching the production step's
        # `loss` metric in split mode
        loss = (train_ind * losses).sum() / torch.sum(train_ind)
    else:
        loss.backward()
    optimizer.step()
    # the reference updates the LR AFTER the step with the PRE-increment
    # global step (reference train.py:1631-1643, += 1 at :1952)
    decay_rate, warming_up = 0.1, 1000
    new_lrate = args.lrate * (decay_rate ** (global_step / args.lrate_decay))
    if global_step < warming_up:
        new_lrate /= (20.0 * (-(global_step - warming_up) / warming_up) + 1.0)
    for group in optimizer.param_groups:
        group["lr"] = new_lrate
    return float(loss.detach())


def torch_probe_psnr(ref_train, args, rk_train, latents, probe,
                     img2t: np.ndarray) -> float:
    import torch
    img, ro, rd, target = probe
    with torch.no_grad():
        lat = torch.stack([latents[img2t[i]].detach() for i in img])
        rk = dict(rk_train)
        rk.update(perturb=0.0, raw_noise_std=0.0)
        rgb, _, _, _ = ref_train.render(
            torch.tensor(ro), torch.tensor(rd), chunk=args.chunk, ndc=False,
            additional_pixel_information={"ray_bending_latents": lat},
            detailed_output=False, **{k: v for k, v in rk.items()
                                      if k not in ("ndc",)})
        mse = float(((rgb - torch.tensor(target)) ** 2).mean())
    return -10.0 * np.log10(mse)


# ---------------------------------------------------------------------------
# JAX (production) side
# ---------------------------------------------------------------------------

def build_jax_side(steps_args, rk_train, latents, near, far):
    import functools
    import jax
    from tests.test_reference_e2e import params_from_reference
    from nonrigid_nerf_tpu.config import (ModelConfig, RenderSettings,
                                          TrainConfig)
    from nonrigid_nerf_tpu.engine import train_step as ts_mod
    from nonrigid_nerf_tpu.engine import losses as losses_mod
    from nonrigid_nerf_tpu.engine.train_state import (TrainState,
                                                      make_optimizer)

    cfg = ModelConfig(N_samples=steps_args.n_samples,
                      N_importance=steps_args.n_importance,
                      use_viewdirs=steps_args.use_viewdirs,
                      approx_nonrigid_viewdirs=not steps_args.exact_viewdirs,
                      fused_kernel="off")
    rs = RenderSettings(N_samples=steps_args.n_samples,
                        N_importance=steps_args.n_importance,
                        near=near, far=far, perturb=0.0, raw_noise_std=0.0)
    tc = TrainConfig(N_rand=steps_args.n_rand, offsets_loss_weight=60.0,
                     divergence_loss_weight=3.0, rigidity_loss_weight=5e-4,
                     N_iters=200000, lrate=5e-4, lrate_decay=250000)

    # patches are installed here and restored by run()'s finally block so
    # the tool is safe to call in-process (e.g. from the smoke test)
    restore = []
    if steps_args.divergence == "exact":
        orig = losses_mod.divergence_loss
        restore.append(lambda: setattr(losses_mod, "divergence_loss", orig))
        losses_mod.divergence_loss = functools.partial(orig, exact=True)

    params0 = jax.tree_util.tree_map(
        lambda x: np.array(x, copy=True),
        params_from_reference(rk_train, latents))
    optimizer = make_optimizer(tc)
    state = TrainState(params=params0, opt_state=optimizer.init(params0),
                       step=np.int32(0))

    # drive the production step with the shared host batch: the sampler is
    # replaced by pass-through of the `ds` argument (batch-content parity
    # with the real on-device sampler is pinned by tests/test_train_step.py)
    orig_sampler = ts_mod.sample_ray_batch
    restore.append(lambda: setattr(ts_mod, "sample_ray_batch", orig_sampler))
    ts_mod.sample_ray_batch = lambda key, ds, n_rand: ds
    step_fn = jax.jit(functools.partial(
        ts_mod.train_step, cfg=cfg, tc=tc, rs=rs, optimizer=optimizer,
        has_test_split=steps_args.test_frames > 0,
        n_rand=steps_args.n_rand))
    return cfg, rs, state, step_fn, optimizer, restore


def import_reference_state(rk_train, latents, optimizer_t, step: int,
                           optimizer_j):
    """Split-brain handover: write a REAL reference-format tar (the exact
    dict the reference saves, train.py:1668-1705), then import it through
    the production interop path (tar -> params + Adam state -> TrainState).
    This is the 'continue a half-trained reference experiment here' move,
    exercised mid-trajectory."""
    import tempfile

    import torch
    from nonrigid_nerf_tpu import interop
    from nonrigid_nerf_tpu.engine.train_state import TrainState

    with tempfile.TemporaryDirectory() as td:
        tar = os.path.join(td, f"{step:06d}.tar")
        torch.save({
            "global_step": step,
            "network_fn_state_dict": rk_train["network_fn"].state_dict(),
            "network_fine_state_dict":
                rk_train["network_fine"].state_dict(),
            "ray_bender_state_dict": rk_train["ray_bender"].state_dict(),
            "optimizer_state_dict": optimizer_t.state_dict(),
            "ray_bending_latent_codes":
                torch.stack([l.detach() for l in latents]),
            "intrinsics": {}, "scripts_dict": {}, "dataset_extras": {},
        }, tar)
        ckpt = interop.load_reference_tar(tar)
    params, info = interop.params_from_reference_tar(ckpt)
    assert info["global_step"] == step
    opt_state = interop.opt_state_from_reference_tar(ckpt, params, info,
                                                     optimizer_j)
    return TrainState(params=params, opt_state=opt_state,
                      step=np.int32(step))


def jax_batch_dict(batch, img2t, test_frame_mask=None):
    import jax.numpy as jnp
    img, ro, rd, target = batch
    if test_frame_mask is None:
        test = np.zeros(len(img), np.float32)
    else:
        test = test_frame_mask[img].astype(np.float32)
    return {
        "rays_o": jnp.asarray(ro), "rays_d": jnp.asarray(rd),
        "target_rgb": jnp.asarray(target),
        "image_ids": jnp.asarray(img),
        "timestep_ids": jnp.asarray(img2t[img]),
        "train_indicator": jnp.asarray(1.0 - test),
        "test_indicator": jnp.asarray(test),
    }


def jax_probe_psnr(params, cfg, rs, probe, img2t) -> float:
    import jax
    import jax.numpy as jnp
    from nonrigid_nerf_tpu.engine.render import render_rays
    img, ro, rd, target = probe
    lat = params["latents"][jnp.asarray(img2t[img])]
    out = render_rays(params, cfg, rs, jnp.asarray(ro), jnp.asarray(rd),
                      lat, key=None)
    mse = float(jnp.mean((out["rgb_map"] - jnp.asarray(target)) ** 2))
    return -10.0 * np.log10(mse)


# ---------------------------------------------------------------------------

def run(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--frames", type=int, default=9)
    p.add_argument("--n_rand", type=int, default=256)
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--n_importance", type=int, default=32)
    p.add_argument("--eval_every", type=int, default=150)
    p.add_argument("--probe_rays", type=int, default=4096)
    p.add_argument("--early_window", type=int, default=50,
                   help="steps over which the per-step loss gap is asserted "
                        "tight (before fp32 chaos separates trajectories)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test_frames", type=int, default=0,
                   help="make the LAST N frames a held-out block: both "
                        "sides run the reference's two-phase backward "
                        "(test rays optimize latents only, reference "
                        "train.py:1594-1608) and the probe PSNR is "
                        "reported separately for train and test frames")
    p.add_argument("--divergence", choices=["exact", "approx"],
                   default="exact")
    p.add_argument("--use_viewdirs", action="store_true",
                   help="view-direction conditioning (nonrigid FD dirs; "
                        "--exact_viewdirs for the bending-Jacobian variant)")
    p.add_argument("--exact_viewdirs", action="store_true")
    p.add_argument("--handover", type=int, default=0, metavar="N",
                   help="split-brain interop mode: the REFERENCE alone "
                        "trains the first N steps, its checkpoint is then "
                        "written in the reference tar format and imported "
                        "through nonrigid_nerf_tpu.interop, and BOTH sides "
                        "continue to --steps; gaps are reported over the "
                        "continuation window (reference checkpoint "
                        "contract: train.py:1668-1705)")
    p.add_argument("--multiview", default=None, metavar="DIR",
                   help="A/B a calibration.json multi-view rig from DIR "
                        "(e.g. tools/make_multiview_dataset.py output) "
                        "instead of the monocular example_sequence: "
                        "per-view intrinsics, image->timestep latent "
                        "sharing (reference: load_llff.py:36-73, "
                        "train.py:1222-1322); --factor/--frames are ignored")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "r3_ab_trajectory"))
    p.add_argument("--no_plot", action="store_true")
    args = p.parse_args(argv)

    # CPU on both sides, set before any jax import. The env var alone is
    # not enough — the axon TPU plugin can override JAX_PLATFORMS (same
    # workaround as tests/conftest.py), so also force it on the config.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.multiview:
        images, c2w, intrin, near, far, img2t = load_multiview_dataset(
            args.multiview)
        args.frames = len(images)
        num_latents = int(img2t.max()) + 1
        print(f"multi-view data: {len(images)} images = "
              f"{len(set(np.asarray(img2t)))} timesteps x "
              f"{len(images) // num_latents} views", flush=True)
    else:
        images, c2w, intrin, near, far = load_example_subset(
            args.factor, args.frames)
        img2t = np.arange(args.frames)
        num_latents = args.frames
    print(f"data: {images.shape[0]} frames at "
          f"{images.shape[1]}x{images.shape[2]}, near={near:.3f} "
          f"far={far:.3f}", flush=True)
    rays = precompute_rays(c2w, intrin)

    restore = []
    with tempfile.TemporaryDirectory() as workdir:
        ref_train, rargs, rk_train, latents, optimizer, restore_t = \
            build_reference_side(args, num_latents, near, far, workdir)
        cfg, rs, state, step_fn, optimizer_j, restore_j = build_jax_side(
            args, rk_train, latents, near, far)
        restore = restore_t + restore_j
        try:
            wrapper = ref_train.training_wrapper_class(
                rk_train["network_fn"], latents,
                fine_model=rk_train["network_fine"],
                ray_bender=rk_train["ray_bender"])

            test_mask = None
            train_pool = None
            if args.test_frames > 0:
                assert not args.multiview, \
                    "--test_frames is a monocular-mode option"
                test_mask = np.zeros(args.frames, bool)
                test_mask[-args.test_frames:] = True
                train_pool = np.where(~test_mask)[0]

            rng = np.random.RandomState(args.seed + 1)
            probe_rng = np.random.RandomState(args.seed + 2)
            probe = make_batch(probe_rng, rays, images, args.probe_rays,
                               frame_pool=train_pool)
            probe_test = None
            if args.test_frames > 0:
                probe_test = make_batch(probe_rng, rays, images,
                                        args.probe_rays,
                                        frame_pool=np.where(test_mask)[0])

            import jax
            loss_torch, loss_jax = [], []
            evals = []       # (step, psnr_torch, psnr_jax) on train frames
            evals_test = []  # same on held-out frames
            t_torch = t_jax = 0.0
            key = jax.random.PRNGKey(0)  # unused by the deterministic step

            def run_probes(step):
                pt = torch_probe_psnr(ref_train, rargs, rk_train, latents,
                                      probe, img2t)
                pj = jax_probe_psnr(state.params, cfg, rs, probe, img2t)
                evals.append((step, pt, pj))
                msg = (f"step {step:5d}: probe PSNR torch={pt:.3f} "
                       f"jax={pj:.3f} (gap {pj - pt:+.3f} dB)")
                if probe_test is not None:
                    qt = torch_probe_psnr(ref_train, rargs, rk_train,
                                          latents, probe_test, img2t)
                    qj = jax_probe_psnr(state.params, cfg, rs, probe_test,
                                        img2t)
                    evals_test.append((step, qt, qj))
                    msg += (f" | held-out torch={qt:.3f} jax={qj:.3f} "
                            f"(gap {qj - qt:+.3f} dB)")
                print(msg, flush=True)

            jax_active = args.handover == 0
            for step in range(args.steps):
                if args.handover and step == args.handover:
                    # the reference has completed `handover` steps; write
                    # its tar and import it into the production TrainState
                    state = import_reference_state(
                        rk_train, latents, optimizer, step, optimizer_j)
                    jax_active = True
                    print(f"step {step:5d}: handover — reference tar "
                          f"imported, both sides continue", flush=True)
                if jax_active and (step % args.eval_every == 0
                                   or step == args.steps - 1):
                    run_probes(step)
                batch = make_batch(rng, rays, images, args.n_rand)
                t0 = time.time()
                lt = torch_step(ref_train, rargs, rk_train, latents,
                                optimizer, wrapper, batch, step,
                                img2t, test_frame_mask=test_mask)
                t1 = time.time()
                loss_torch.append(lt)
                t_torch += t1 - t0
                if not jax_active:
                    continue
                state, metrics = step_fn(
                    state, jax_batch_dict(batch, img2t, test_mask), key)
                lj = float(metrics["loss"])
                t_jax += time.time() - t1
                loss_jax.append(lj)
                if step - args.handover < 5 or step % 100 == 0:
                    print(f"step {step:5d}: loss torch={lt:.6f} "
                          f"jax={lj:.6f}", flush=True)

            run_probes(args.steps)
        finally:
            for f in restore:
                f()

    # with --handover the jax trajectory exists only from step `handover`
    # on; gaps are computed over the aligned continuation window
    lt = np.asarray(loss_torch)[args.handover:]
    lj = np.asarray(loss_jax)
    w = min(args.early_window, len(lj))
    early_rel = np.abs(lt[:w] - lj[:w]) / np.abs(lt[:w])
    # the max is dominated by the known 1/pdf-amplified rounding outliers
    # (see tests/test_reference_e2e.py TOL comment); the median is the
    # typical step
    early_gap = float(np.max(early_rel))
    early_median = float(np.median(early_rel))
    tail = max(1, len(evals) // 3)
    tail_gaps = [e[2] - e[1] for e in evals[-tail:]]
    summary = {
        "steps": args.steps,
        "config": {
            "factor": args.factor, "frames": args.frames,
            "n_rand": args.n_rand, "n_samples": args.n_samples,
            "n_importance": args.n_importance,
            "divergence": args.divergence, "seed": args.seed,
            "test_frames": args.test_frames,
            "multiview": bool(args.multiview),
            "num_latents": int(num_latents),
            "use_viewdirs": args.use_viewdirs,
            "exact_viewdirs": args.exact_viewdirs,
            "near": near, "far": far,
            "resolution": list(images.shape[1:3]),
        },
        "early_window": w,
        "early_max_rel_loss_gap": early_gap,
        "early_median_rel_loss_gap": early_median,
        "final_psnr_torch": evals[-1][1],
        "final_psnr_jax": evals[-1][2],
        "final_psnr_gap_db": evals[-1][2] - evals[-1][1],
        "tail_psnr_gaps_db": tail_gaps,
        "mean_tail_psnr_gap_db": float(np.mean(tail_gaps)),
        "handover": args.handover,
        "sec_per_step_torch_cpu": t_torch / args.steps,
        "sec_per_step_jax_cpu": t_jax / max(len(lj), 1),
    }
    if evals_test:
        tail_t = [e[2] - e[1] for e in evals_test[-tail:]]
        summary.update(
            final_heldout_psnr_torch=evals_test[-1][1],
            final_heldout_psnr_jax=evals_test[-1][2],
            final_heldout_psnr_gap_db=evals_test[-1][2] - evals_test[-1][1],
            mean_tail_heldout_psnr_gap_db=float(np.mean(tail_t)))
    print(json.dumps(summary, indent=2))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "trajectory.json"), "w") as f:
        json.dump({**summary,
                   "loss_torch": loss_torch, "loss_jax": loss_jax,
                   "evals": evals, "evals_test": evals_test}, f)

    if not args.no_plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(11, 4))
            xs = args.handover + np.arange(len(lt))
            ax0.plot(xs, lt, label="PyTorch reference", lw=1.0)
            ax0.plot(xs[:len(lj)], lj, label="nonrigid_nerf_tpu", lw=1.0,
                     ls="--")
            if args.handover:
                ax0.axvline(args.handover, color="k", lw=0.8, ls=":")
            ax0.set_yscale("log")
            ax0.set_xlabel("step")
            ax0.set_ylabel("total training loss")
            ax0.legend()
            ev = np.asarray(evals)
            ax1.plot(ev[:, 0], ev[:, 1], "o-", label="PyTorch reference")
            ax1.plot(ev[:, 0], ev[:, 2], "s--", label="nonrigid_nerf_tpu")
            if evals_test:
                et = np.asarray(evals_test)
                ax1.plot(et[:, 0], et[:, 1], "o-", alpha=0.5,
                         label="reference (held-out)")
                ax1.plot(et[:, 0], et[:, 2], "s--", alpha=0.5,
                         label="ours (held-out)")
            ax1.set_xlabel("step")
            ax1.set_ylabel("probe PSNR (dB)")
            ax1.legend()
            fig.suptitle("Identical init + identical batches: "
                         "long-horizon A/B vs the PyTorch reference")
            fig.tight_layout()
            fig.savefig(os.path.join(args.out, "trajectory.png"), dpi=120)
        except Exception as e:  # plot is a convenience, not the artifact
            print(f"plot skipped: {e}")
    return summary


if __name__ == "__main__":
    run()
