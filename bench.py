"""Benchmark: NR-NeRF training throughput on the available accelerator.

Measures the full reference training workload — 1024 rays/step, 64 coarse +
64 importance samples through coarse+fine 8x256 MLPs with ray bending,
rigidity, offsets + divergence + rigidity losses, Adam — as one fused jitted
step on device, on the example_sequence data when available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Contention robustness: a single timed window on a shared box can be
contaminated by another process holding the chip (this corrupted one mode's
reading in the round-4 official artifact by 4.4x). Every mode is therefore
measured in at least two INDEPENDENT timed windows; if the two best windows
disagree by more than 2%, more windows are taken (up to 6). The reported
value is the fastest window (contention only ever slows a window down —
the fastest reading is the least contaminated), and each mode carries a
`steadiness` field: best/second-best window ratio (~1.0 == the reported
number was independently reproduced). The raw per-window readings are
emitted under "windows" so nothing is hidden.

Baseline: the reference publishes no absolute numbers (BASELINE.md). The
documented estimate used here: PyTorch NR-NeRF trains 200k iters in ~1 day
on a V100 at N_rand=1024 => ~2.3 it/s => ~2400 train rays/sec. vs_baseline
is measured rays/sec divided by that.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

V100_BASELINE_RAYS_PER_SEC = 2400.0
EXAMPLE_DATA = "/root/reference/data/example_sequence"

# stop adding windows once the two best agree within this factor
STEADY_TOL = 1.02
MAX_WINDOWS = 6
MIN_WINDOWS = 2


def build_dataset():
    from nonrigid_nerf_tpu.data import (
        load_llff_data, get_multi_view_mappings, get_intrinsics,
        block_train_test_split, build_ray_dataset)
    if os.path.isdir(EXAMPLE_DATA):
        images, poses, bds, _, _ = load_llff_data(EXAMPLE_DATA, factor=1)
        extras = get_multi_view_mappings(len(images), EXAMPLE_DATA)
        intrin = get_intrinsics(EXAMPLE_DATA, extras, images, poses[0, :, 4])
        i_train, i_test = block_train_test_split(
            len(extras["raw_timesteps"]), extras["imageid_to_timestepid"])
        near, far = float(bds.min()) * 0.9, float(bds.max())
        return build_ray_dataset(images, poses[:, :3, :4], intrin, extras,
                                 i_train, i_test, near, far)
    # synthetic fallback with the example_sequence geometry
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _synthetic_dataset
    return _synthetic_dataset(n_images=86, H=384, W=512)


def steady_windows(run_window, n_windows_min=MIN_WINDOWS,
                   n_windows_max=MAX_WINDOWS, tol=STEADY_TOL):
    """Run `run_window()` (returns a rate) until the two best readings agree
    within `tol`, between n_windows_min and n_windows_max times.

    Returns (value, steadiness, windows): value = fastest window (least
    contaminated), steadiness = best/second-best ratio (>= 1.0, ~1.0 means
    independently reproduced), windows = every raw reading.
    """
    windows = [run_window() for _ in range(n_windows_min)]
    while len(windows) < n_windows_max:
        top2 = sorted(windows)[-2:]
        if top2[1] / top2[0] <= tol:
            break
        windows.append(run_window())
    top2 = sorted(windows)[-2:]
    return top2[1], top2[1] / top2[0], list(windows)


def main():
    import jax
    from nonrigid_nerf_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache("~/.cache/nonrigid_nerf_tpu/xla")
    from nonrigid_nerf_tpu.config import (ModelConfig, RenderSettings,
                                          TrainConfig)
    from nonrigid_nerf_tpu.engine.train_state import create_train_state
    from nonrigid_nerf_tpu.engine.train_step import make_train_step
    from nonrigid_nerf_tpu.utils.flops import (device_bf16_peak_tflops,
                                               train_flops_per_ray)

    ds = build_dataset()
    cfg = ModelConfig()
    tc = TrainConfig(N_rand=1024, offsets_loss_weight=60.0,
                     divergence_loss_weight=3.0, rigidity_loss_weight=5e-4,
                     N_iters=200000)
    rs = RenderSettings(near=ds.near, far=ds.far, raw_noise_std=1.0)

    key = jax.random.PRNGKey(1)
    peak = device_bf16_peak_tflops(jax.devices()[0])
    steadiness, windows, mfu = {}, {}, {}
    last = {}

    def measure_train(name, cfg, n_steps=300, ds=ds, has_test_split=False,
                      n_backwards=1):
        """Multi-window train-step throughput for one mode. NOTE: on the
        tunneled TPU platform block_until_ready can return before remote
        execution completes; fetching a scalar is the only reliable
        synchronization, so all timing fences are float(...) fetches."""
        state = create_train_state(jax.random.PRNGKey(0), cfg, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(cfg, tc, rs, has_test_split=has_test_split)
        st, metrics = step_fn(state, ds, key)
        float(metrics["loss"])
        for _ in range(10):
            st, metrics = step_fn(st, ds, key)
        float(metrics["loss"])
        box = {"state": st, "metrics": metrics}

        def run_window():
            t0 = time.perf_counter()
            st, metrics = box["state"], box["metrics"]
            for _ in range(n_steps):
                st, metrics = step_fn(st, ds, key)
            float(metrics["loss"])
            box["state"], box["metrics"] = st, metrics
            return tc.N_rand * n_steps / (time.perf_counter() - t0)

        value, steadiness[name], windows[name] = steady_windows(run_window)
        flops_per_ray = train_flops_per_ray(
            cfg, divergence_weight=tc.divergence_loss_weight,
            n_backwards=n_backwards)
        if peak:
            mfu[name] = round(value * flops_per_ray / 1e12 / peak, 4)
        last["state"], last["metrics"] = box["state"], box["metrics"]
        last["flops_per_ray"] = flops_per_ray
        return value

    # headline: the DEFAULT config (reference-parity f32 bend/encoding
    # stage + the Pallas MLP kernel)
    rays_per_sec = measure_train("default", cfg, n_steps=400)
    steps_per_sec = rays_per_sec / tc.N_rand
    flops_per_ray = last["flops_per_ray"]
    model_tflops = rays_per_sec * flops_per_ray / 1e12
    metrics = last["metrics"]

    # secondary: the documented bf16 activation mode (compute_dtype knob)
    rays_per_sec_bf16 = measure_train(
        "bf16", dataclasses.replace(cfg, compute_dtype="bfloat16"))
    # secondary: view-direction conditioning (the reference's +20-35%
    # overhead mode, README.md:128) through the viewdirs MLP kernel,
    # both the FD (approx) and bending-Jacobian (exact) variants
    cfg_vd = dataclasses.replace(cfg, use_viewdirs=True)
    rays_per_sec_vd = measure_train("viewdirs", cfg_vd)
    rays_per_sec_vde = measure_train(
        "viewdirs_exact",
        dataclasses.replace(cfg, use_viewdirs=True,
                            approx_nonrigid_viewdirs=False))
    # secondary: train/test block-split mode (two cotangent pulls through
    # one vjp == the reference's two backward passes, train.py:1594-1608;
    # n_backwards=2 so its MFU counts the real 5x-forward algorithmic cost)
    import jax.numpy as _jnp
    _ids = np.arange(ds.num_images)
    _test = (_ids % 7) >= 5  # 5-train/2-test block pattern
    ds_split = dataclasses.replace(
        ds,
        train_indicator=_jnp.asarray((~_test).astype(np.float32)),
        test_indicator=_jnp.asarray(_test.astype(np.float32)))
    rays_per_sec_split = measure_train("block_split", cfg, ds=ds_split,
                                       has_test_split=True, n_backwards=2)

    # secondary metric: inference throughput (full-image rendering path)
    from nonrigid_nerf_tpu.engine.render import make_ray_renderer
    from nonrigid_nerf_tpu.ops.rays import get_rays
    import jax.numpy as jnp
    state = last["state"]
    intrin0 = {"height": ds.height, "width": ds.width,
               "focal_x": float(ds.view_intrinsics[0, 0]),
               "focal_y": float(ds.view_intrinsics[0, 1]),
               "center_x": float(ds.view_intrinsics[0, 2]),
               "center_y": float(ds.view_intrinsics[0, 3])}
    rays_o, rays_d = get_rays(ds.poses[0], intrin0)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    latents = jnp.zeros((rays_o.shape[0], cfg.ray_bending_latent_size))
    renderer = make_ray_renderer(cfg, rs.test_mode(), chunk=32768)
    out = renderer(state.params, rays_o, rays_d, latents, None)
    float(out["rgb_map"][0, 0])

    def render_window(n_frames=5):
        t0 = time.perf_counter()
        for _ in range(n_frames):
            out = renderer(state.params, rays_o, rays_d, latents, None)
        float(out["rgb_map"][0, 0])
        return n_frames * rays_o.shape[0] / (time.perf_counter() - t0)

    render_rays_per_sec, steadiness["render"], windows["render"] = \
        steady_windows(render_window)

    steadiness = {k: round(v, 4) for k, v in steadiness.items()}
    windows = {k: [round(w, 1) for w in v] for k, v in windows.items()}
    result = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / V100_BASELINE_RAYS_PER_SEC, 2),
        "steps_per_sec": round(steps_per_sec, 2),
        "config": "example_sequence defaults (N_rand=1024, 64+64 samples, "
                  "full NR-NeRF losses, f32 bend stage + Pallas MLP kernel)",
        "device": str(jax.devices()[0]),
        "final_psnr_sample": round(float(metrics["psnr"]), 2),
        "render_rays_per_sec": round(render_rays_per_sec, 1),
        "train_rays_per_sec_bf16": round(rays_per_sec_bf16, 1),
        "train_rays_per_sec_viewdirs": round(rays_per_sec_vd, 1),
        "train_rays_per_sec_viewdirs_exact": round(rays_per_sec_vde, 1),
        "train_rays_per_sec_block_split": round(rays_per_sec_split, 1),
        # model-FLOP throughput (matmul FLOPs, fwd+bwd=3x — 5x for the
        # two-backward block-split mode — algorithmic work only; remat
        # recompute excluded; see utils/flops.py)
        "model_flops_per_train_ray": flops_per_ray,
        "model_tflops_per_sec": round(model_tflops, 2),
        "mfu_vs_bf16_peak": (round(model_tflops / peak, 4)
                             if peak else None),
        "bf16_peak_tflops": peak,
        "model_tflops_per_sec_viewdirs": round(
            rays_per_sec_vd * train_flops_per_ray(
                cfg_vd, divergence_weight=tc.divergence_loss_weight)
            / 1e12, 2),
        # per-mode MFU vs bf16 peak (exact-viewdirs and block-split modes
        # included; block-split counts its 5x-forward cost)
        "mfu": mfu,
        # contention defense: value = fastest independent window; steadiness
        # = best/second-best window ratio (~1.0 == reproduced); raw windows
        # included for audit. A mode whose windows span >5% indicates
        # another process held the chip during measurement.
        "steadiness": steadiness,
        "windows": windows,
        "contention_detected": bool(any(
            max(v) / min(v) > 1.05 for v in windows.values())),
        # the reference publishes no absolute numbers (BASELINE.md);
        # vs_baseline divides by the documented estimate below
        "baseline_estimated": True,
        "baseline_assumption": "PyTorch NR-NeRF ~200k iters/day on V100 "
                               "at N_rand=1024 => ~2400 train rays/s",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
