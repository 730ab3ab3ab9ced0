"""Multi-view pipeline: calibration.json loading -> per-view intrinsics ->
training with view/timestep mappings (reference schema: README.md:177-215)."""

import json
import os

import jax
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.data import (block_train_test_split, build_ray_dataset,
                                    get_intrinsics, get_multi_view_mappings,
                                    load_llff_data_multi_view)
from nonrigid_nerf_tpu.engine.train_state import create_train_state
from nonrigid_nerf_tpu.engine.train_step import make_train_step
from tests.test_train_step import TINY


def write_multiview_dataset(root, n_views=2, n_timesteps=3, H=10, W=12):
    import imageio.v2 as imageio
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.RandomState(0)

    views = [f"cam{v}" for v in range(n_views)]
    mapping = {}
    idx = 0
    for t in range(n_timesteps):
        for v, view in enumerate(views):
            name = f"img{idx:04d}.png"
            img = np.zeros((H, W, 3), np.uint8)
            img[:, (2 * t + v) % W] = [255, 100, 50]
            imageio.imwrite(os.path.join(imgdir, name), img)
            mapping[name] = [view, t]
            idx += 1

    calibration = {"min_bound": 2.0, "max_bound": 6.0}
    avg_calibration = {}
    for v, view in enumerate(views):
        R = np.eye(3)
        tvec = [0.1 * v, 0.0, 0.0]
        calibration[view] = {"rotation": R.tolist(), "translation": tvec}
        avg_calibration[view] = {
            "height": H, "width": W, "focal_x": 20.0 + v, "focal_y": 20.0,
            "center_x": W / 2, "center_y": H / 2}
    with open(os.path.join(root, "calibration.json"), "w") as f:
        json.dump(calibration, f)
    with open(os.path.join(root, "calibration_averaged_camera_view.json"),
              "w") as f:
        json.dump(avg_calibration, f)
    with open(os.path.join(root,
                           "image_to_camera_id_and_timestep.json"), "w") as f:
        json.dump(mapping, f)
    return n_views * n_timesteps


class TestMultiViewPipeline:
    def test_loader(self, tmp_path):
        n = write_multiview_dataset(str(tmp_path))
        images, poses, bds, render_poses, i_test = \
            load_llff_data_multi_view(str(tmp_path), factor=1)
        assert images.shape[0] == n
        assert poses.shape == (n, 3, 5)
        np.testing.assert_allclose(bds, [2.0, 6.0])
        # image 1 belongs to cam1 -> translation x = 0.1
        np.testing.assert_allclose(poses[1, 0, 3], 0.1, atol=1e-6)

    def test_intrinsics_per_view(self, tmp_path):
        n = write_multiview_dataset(str(tmp_path))
        images, poses, *_ = load_llff_data_multi_view(str(tmp_path), factor=1)
        extras = get_multi_view_mappings(n, str(tmp_path))
        assert extras["is_multiview"]
        intrin = get_intrinsics(str(tmp_path), extras, images, poses[0, :, 4])
        assert len(intrin) == 2
        assert intrin[0]["focal_x"] == 20.0
        assert intrin[1]["focal_x"] == 21.0

    def test_training_runs(self, tmp_path):
        n = write_multiview_dataset(str(tmp_path))
        images, poses, bds, *_ = load_llff_data_multi_view(str(tmp_path),
                                                           factor=1)
        extras = get_multi_view_mappings(n, str(tmp_path))
        intrin = get_intrinsics(str(tmp_path), extras, images, poses[0, :, 4],
                                ray_bending_latent_size=4)
        i_train, i_test = block_train_test_split(
            len(extras["raw_timesteps"]), extras["imageid_to_timestepid"],
            train_block_size=2, test_block_size=1)
        ds = build_ray_dataset(images, poses[:, :3, :4], intrin, extras,
                               i_train, i_test, near=1.8, far=6.0)
        # 3 timesteps (2 train, 1 test) x 2 views
        assert ds.num_timesteps == 3
        assert float(ds.test_indicator.sum()) == 2.0   # both views of t=2

        tc = TrainConfig(N_rand=32, offsets_loss_weight=60.0, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.8, far=6.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=True,
                                  donate=False)
        state, metrics = step_fn(state, ds, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert state.params["latents"].shape == (3, 4)


def test_load_dataset_divides_multiview_intrinsics_by_factor(tmp_path):
    """Training multi-view data with factor>1 must downscale the
    FULL-resolution calibration.json focal/center values to match the
    downsampled images (reference: train.py:1354-1366)."""
    write_multiview_dataset(str(tmp_path))
    import train as train_module
    from nonrigid_nerf_tpu.config import Args

    args = Args(datadir=str(tmp_path), factor=2, ray_bending_latent_size=4)
    (ds, images, poses, render_poses, intrinsics, extras,
     i_train, i_test) = train_module.load_dataset(args)
    assert images.shape[1:3] == (5, 6)          # 10x12 pooled by 2
    assert intrinsics[0]["focal_x"] == 10.0     # 20.0 / factor
    assert intrinsics[1]["focal_x"] == 10.5     # 21.0 / factor
    assert intrinsics[0]["center_x"] == 3.0     # (12/2) / factor
    assert intrinsics[0]["height"] == 5 and intrinsics[0]["width"] == 6


def test_intrinsics_fallback_to_calibration_json(tmp_path):
    """Per the reference README, intrinsics may live inside calibration.json
    itself instead of calibration_averaged_camera_view.json."""
    n = write_multiview_dataset(str(tmp_path))
    # merge the avg-view intrinsics into calibration.json, drop the avg file
    with open(os.path.join(tmp_path, "calibration.json")) as f:
        calib = json.load(f)
    with open(os.path.join(tmp_path,
                           "calibration_averaged_camera_view.json")) as f:
        avg = json.load(f)
    for view, cam in avg.items():
        calib[view].update(cam)
    with open(os.path.join(tmp_path, "calibration.json"), "w") as f:
        json.dump(calib, f)
    os.remove(os.path.join(tmp_path,
                           "calibration_averaged_camera_view.json"))

    from nonrigid_nerf_tpu.data import load_llff_data_multi_view
    images, poses, *_ = load_llff_data_multi_view(str(tmp_path), factor=1)
    extras = get_multi_view_mappings(n, str(tmp_path))
    intrin = get_intrinsics(str(tmp_path), extras, images, poses[0, :, 4])
    assert intrin[0]["focal_x"] == 20.0
    assert intrin[1]["focal_x"] == 21.0
