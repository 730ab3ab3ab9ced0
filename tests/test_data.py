"""Data loader + device dataset tests (synthetic fixtures on disk)."""

import json
import os

import jax
import numpy as np
import pytest

from nonrigid_nerf_tpu.data import (
    load_llff_data, get_multi_view_mappings, get_intrinsics,
    block_train_test_split, build_ray_dataset)
from nonrigid_nerf_tpu.data.dataset import sample_ray_batch


def write_synthetic_sequence(root, n=6, H=12, W=16, focal=20.0):
    """A precomputed.json-style monocular sequence with a moving bright
    column, mirroring the example_sequence layout."""
    import imageio.v2 as imageio
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.RandomState(0)
    poses = []
    for i in range(n):
        img = np.zeros((H, W, 3), np.uint8)
        img[:, (i * 2) % W: (i * 2) % W + 3] = [255, 128, 0]
        imageio.imwrite(os.path.join(imgdir, f"image{i:06d}.png"), img)
        c2w = np.eye(4)[:3].astype(np.float64)
        c2w[:, 3] = [0.02 * i, 0.0, 0.1 * i]
        pose = np.concatenate(
            [c2w, np.array([[H], [W], [focal]], np.float64)], axis=1)
        poses.append(pose.tolist())
    pre = {
        "poses": poses,
        "bds": [[2.0, 6.0]] * n,
        "render_poses": poses[:3],
        "i_test": 0,
    }
    with open(os.path.join(root, "precomputed.json"), "w") as f:
        json.dump(pre, f)
    return n, H, W, focal


class TestLoadLLFF:
    def test_precomputed_roundtrip(self, tmp_path):
        n, H, W, focal = write_synthetic_sequence(str(tmp_path))
        images, poses, bds, render_poses, i_test = load_llff_data(
            str(tmp_path), factor=1)
        assert images.shape == (n, H, W, 3)
        assert images.dtype == np.float32
        assert images.max() <= 1.0 and images.min() >= 0.0
        assert poses.shape == (n, 3, 5)
        np.testing.assert_allclose(poses[0, :, 4], [H, W, focal])
        assert bds.shape == (n, 2)
        assert i_test == 0

    def test_example_sequence_if_available(self):
        ref_data = "/root/reference/data/example_sequence"
        if not os.path.isdir(ref_data):
            pytest.skip("no reference data")
        images, poses, bds, render_poses, i_test = load_llff_data(
            ref_data, factor=1)
        assert images.shape == (86, 384, 512, 3)
        assert poses.shape == (86, 3, 5)
        assert render_poses.shape == (120, 3, 5)

    def test_downsampling(self, tmp_path):
        n, H, W, focal = write_synthetic_sequence(str(tmp_path))
        images, poses, *_ = load_llff_data(str(tmp_path), factor=2)
        assert images.shape == (n, H // 2, W // 2, 3)


class TestAdaptiveSpiral:
    def test_geometry(self):
        from nonrigid_nerf_tpu.data import adaptive_spiral_poses
        rng = np.random.RandomState(0)
        # cameras scattered around (0, 0, 4) looking down -z
        poses = np.tile(np.eye(4)[:3][None], (12, 1, 1)).astype(np.float32)
        poses[:, :3, 3] = rng.randn(12, 3) * 0.3 + np.array([0, 0, 4.0])
        out = adaptive_spiral_poses(poses, near=2.0, far=6.0, n_views=30)
        assert out.shape == (30, 3, 4)
        assert np.isfinite(out).all()
        # rotation columns stay orthonormal
        R = out[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (30, 1, 1)),
                                   atol=1e-5)
        # every spiral camera keeps looking toward the scene (camera -z in
        # world space has negative world-z, like the inputs)
        assert (out[:, 2, 2] > 0).all()
        # path orbits: positions vary around the mean input camera
        spread = out[:, :3, 3].std(axis=0)
        assert spread.max() > 0.05

    def test_static_capture_still_orbits(self):
        from nonrigid_nerf_tpu.data import adaptive_spiral_poses
        poses = np.tile(np.eye(4)[:3][None], (5, 1, 1)).astype(np.float32)
        poses[:, 2, 3] = 4.0   # all cameras identical
        out = adaptive_spiral_poses(poses, near=2.0, far=6.0, n_views=16)
        assert np.isfinite(out).all()
        assert out[:, :3, 3].std(axis=0).max() > 1e-3


class TestMappings:
    def test_monocular_identity(self):
        extras = get_multi_view_mappings(5, "/nonexistent")
        assert not extras["is_multiview"]
        assert extras["imageid_to_timestepid"] == [0, 1, 2, 3, 4]
        assert extras["imageid_to_viewid"] == [0, 1, 2, 3, 4]
        assert len(extras["raw_timesteps"]) == 5

    def test_multiview_mapping(self, tmp_path):
        mapping = {"img0": ["camA", 0], "img1": ["camB", 0],
                   "img2": ["camA", 1], "img3": ["camB", 1]}
        with open(tmp_path / "image_to_camera_id_and_timestep.json", "w") as f:
            json.dump(mapping, f)
        extras = get_multi_view_mappings(4, str(tmp_path))
        assert extras["is_multiview"]
        assert extras["imageid_to_timestepid"] == [0, 0, 1, 1]
        assert extras["imageid_to_viewid"] == [0, 1, 0, 1]
        assert extras["raw_views"] == ["camA", "camB"]


class TestSplit:
    def test_no_split(self):
        i_train, i_test = block_train_test_split(10, list(range(10)))
        assert len(i_train) == 10 and len(i_test) == 0

    def test_block_split(self):
        # 5 train, 2 test over 10 timesteps: AAAAABB AAA
        i_train, i_test = block_train_test_split(
            10, list(range(10)), train_block_size=5, test_block_size=2)
        np.testing.assert_array_equal(i_test, [5, 6])
        np.testing.assert_array_equal(i_train, [0, 1, 2, 3, 4, 7, 8, 9])

    def test_multiview_split_by_timestep(self):
        # 2 views x 4 timesteps
        t_ids = [0, 0, 1, 1, 2, 2, 3, 3]
        i_train, i_test = block_train_test_split(
            4, t_ids, train_block_size=2, test_block_size=1)
        np.testing.assert_array_equal(i_test, [4, 5])  # both views of t=2


class TestDeviceDataset:
    def _build(self, tmp_path):
        n, H, W, focal = write_synthetic_sequence(str(tmp_path))
        images, poses, bds, render_poses, i_test = load_llff_data(
            str(tmp_path), factor=1)
        extras = get_multi_view_mappings(n, str(tmp_path))
        intrin = get_intrinsics(str(tmp_path), extras, images, poses[0, :, 4])
        i_train, i_test = block_train_test_split(
            n, extras["imageid_to_timestepid"])
        return build_ray_dataset(images, poses[:, :3, :4], intrin, extras,
                                 i_train, i_test, near=bds.min() * 0.9,
                                 far=bds.max()), images

    def test_build_and_sample(self, tmp_path):
        ds, images = self._build(tmp_path)
        assert ds.images.dtype == np.uint8
        batch = sample_ray_batch(jax.random.PRNGKey(0), ds, 64)
        assert batch["rays_o"].shape == (64, 3)
        assert batch["rays_d"].shape == (64, 3)
        assert batch["target_rgb"].shape == (64, 3)
        assert np.all(np.asarray(batch["train_indicator"]) == 1.0)

    def test_targets_match_images(self, tmp_path):
        ds, images = self._build(tmp_path)
        batch = sample_ray_batch(jax.random.PRNGKey(1), ds, 128)
        img_ids = np.asarray(batch["image_ids"])
        # recompute targets on host: need x, y — re-derive from rays is
        # overkill; instead check every target matches SOME pixel of its image
        targets = np.asarray(batch["target_rgb"])
        for i in range(0, 128, 17):
            img = images[img_ids[i]].reshape(-1, 3)
            dists = np.abs(img - targets[i]).sum(-1)
            assert dists.min() < 1e-2

    def test_dataset_is_pytree(self, tmp_path):
        ds, _ = self._build(tmp_path)
        leaves = jax.tree_util.tree_leaves(ds)
        assert len(leaves) == 7  # the array fields
