"""Preprocessing tests: COLMAP binary parsing, pose conversion,
undistortion."""

import json
import os
import struct
import sys

import numpy as np
import pytest

from nonrigid_nerf_tpu.preprocessing import (
    colmap_to_poses_bounds, qvec2rotmat, read_cameras_binary,
    read_images_binary, read_points3d_binary)


def write_synthetic_colmap_model(model_dir, n_images=4, n_points=50):
    """Write a tiny COLMAP binary model: SIMPLE_PINHOLE camera, cameras on a
    circle looking at the origin, gaussian point cloud."""
    os.makedirs(model_dir, exist_ok=True)
    rng = np.random.RandomState(0)

    with open(os.path.join(model_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 1, 0))              # id, SIMPLE_PINHOLE
        f.write(struct.pack("<QQ", 640, 480))
        f.write(struct.pack("<3d", 500.0, 320.0, 240.0))

    # w2c rotations: camera at distance 4, z-forward pointing at origin
    poses = []
    for i in range(n_images):
        angle = 0.3 * i
        center = np.array([4 * np.sin(angle), 0.0, -4 * np.cos(angle)])
        fwd = -center / np.linalg.norm(center)           # toward origin
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], 0)              # w2c rows
        t = -R @ center
        poses.append((R, t, center))

    def rot2qvec(R):
        w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
        return np.array([w, x, y, z])

    with open(os.path.join(model_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i, (R, t, _) in enumerate(poses):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *rot2qvec(R)))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"image{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                # two 2D points
            for _ in range(2):
                f.write(struct.pack("<2d", 1.0, 2.0))
                f.write(struct.pack("<q", -1))

    pts = 0.5 * rng.randn(n_points, 3)
    with open(os.path.join(model_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for i, xyz in enumerate(pts):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return poses, pts


class TestColmapModel:
    def test_qvec_identity(self):
        np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])),
                                   np.eye(3), atol=1e-12)

    def test_qvec_z_rotation(self):
        # 90 deg about z
        q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(qvec2rotmat(q), expected, atol=1e-12)

    def test_read_synthetic_model(self, tmp_path):
        poses, pts = write_synthetic_colmap_model(str(tmp_path))
        cams = read_cameras_binary(str(tmp_path / "cameras.bin"))
        assert cams[1].model == "SIMPLE_PINHOLE"
        assert cams[1].width == 640
        np.testing.assert_allclose(cams[1].params, [500.0, 320.0, 240.0])

        images = read_images_binary(str(tmp_path / "images.bin"))
        assert len(images) == 4
        assert images[1].name == "image000.png"

        points = read_points3d_binary(str(tmp_path / "points3D.bin"))
        assert len(points) == 50
        np.testing.assert_allclose(points[1].xyz, pts[0])


class TestPosesBounds:
    def test_conversion_geometry(self, tmp_path):
        base = str(tmp_path)
        model = os.path.join(base, "sparse", "0")
        poses, pts = write_synthetic_colmap_model(model)
        arr = colmap_to_poses_bounds(base, model)
        assert arr.shape == (4, 17)
        out = np.load(os.path.join(base, "poses_bounds.npy"))
        np.testing.assert_array_equal(arr, out)

        mats = arr[:, :15].reshape(-1, 3, 5)
        # hwf column
        np.testing.assert_allclose(mats[0, :, 4], [480, 640, 500.0])
        # camera centers survive the axis permutation (translation column)
        for i, (_, _, center) in enumerate(poses):
            np.testing.assert_allclose(mats[i, :, 3], center, atol=1e-6)
        # rotation columns are [down, right, back] of an orthonormal frame
        R = mats[0, :, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-8)
        # bounds positive and ordered
        assert np.all(arr[:, 15] > 0)
        assert np.all(arr[:, 16] > arr[:, 15])

    def test_loader_roundtrip(self, tmp_path):
        """poses_bounds.npy written by gen_poses loads through the LLFF
        loader with consistent camera orientation."""
        import imageio.v2 as imageio
        base = str(tmp_path)
        model = os.path.join(base, "sparse", "0")
        poses_in, _ = write_synthetic_colmap_model(model)
        colmap_to_poses_bounds(base, model)
        imgdir = os.path.join(base, "images")
        os.makedirs(imgdir)
        for i in range(4):
            imageio.imwrite(os.path.join(imgdir, f"image{i:03d}.png"),
                            np.zeros((48, 64, 3), np.uint8))

        from nonrigid_nerf_tpu.data import load_llff_data
        images, poses, bds, render_poses, i_test = load_llff_data(base,
                                                                  factor=1)
        assert poses.shape == (4, 3, 5)
        # rotations orthonormal with det +1 ([right, up, back] frame)
        for p in poses:
            R = p[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) > 0.9


class TestUndistort:
    def test_identity_undistortion(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        import preprocess as pp

        indir = tmp_path / "seq"
        (indir / "images").mkdir(parents=True)
        rng = np.random.RandomState(0)
        img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(indir / "images" / "a.png"), img)

        calib = {
            "newcameramtx": [[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]],
            "mtx": [[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]],
            "dist": [[0.0, 0.0, 0.0, 0.0, 0.0]],
            "roi": (0, 0, 48, 32),
        }
        calib_path = tmp_path / "lens_distortion.json"
        with open(calib_path, "w") as f:
            json.dump(calib, f)

        outdir = tmp_path / "out"
        args = pp.build_parser().parse_args(
            ["--input", str(indir), "--output", str(outdir),
             "--undistort_with_calibration_file", str(calib_path)])
        pp.undistort(args, workers=1)

        out = cv2.imread(str(outdir / "images" / "a.png"))
        np.testing.assert_array_equal(out, cv2.imread(
            str(indir / "images" / "a.png")))
        assert (outdir / "images_mask" / "mask.png").exists()
        assert (outdir / "undistorted_calibration.txt").exists()


class TestLensCalibration:
    """End-to-end checkerboard calibration on SYNTHETIC distorted views with
    known ground-truth intrinsics + distortion (the component the reference
    leaves to real capture data, reference preprocess.py:14-128)."""

    BH, BW = 6, 9            # inner corners
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    DIST = np.array([-0.25, 0.08, 0.0, 0.0, 0.0])
    H, W = 480, 640

    def _render_view(self, cv2, rvec, tvec):
        img = np.full((self.H, self.W), 255, np.uint8)
        for r in range(self.BH + 1):
            for c in range(self.BW + 1):
                if (r + c) % 2 == 0:
                    continue
                quad = np.array([[r, c, 0], [r + 1, c, 0],
                                 [r + 1, c + 1, 0], [r, c + 1, 0]],
                                np.float32)
                pts, _ = cv2.projectPoints(quad, rvec, tvec, self.K,
                                           self.DIST)
                cv2.fillConvexPoly(
                    img, np.round(pts.reshape(-1, 2)).astype(np.int32), 0)
        return img

    def test_recovers_known_distortion(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        import preprocess as pp

        indir = tmp_path / "seq"
        (indir / "images").mkdir(parents=True)
        rng = np.random.RandomState(3)
        center = np.array([(self.BH + 1) / 2.0, (self.BW + 1) / 2.0])
        for i in range(10):
            rvec = np.array([0.25 * rng.randn(), 0.25 * rng.randn(),
                             0.15 * rng.randn()])
            tvec = np.array([-center[1] + 0.8 * rng.randn(),
                             -center[0] + 0.6 * rng.randn(),
                             13.0 + 1.5 * rng.randn()])
            img = self._render_view(cv2, rvec, tvec)
            cv2.imwrite(str(indir / "images" / f"{i:03d}.png"), img)

        outdir = tmp_path / "out"
        outdir.mkdir()
        args = pp.build_parser().parse_args(
            ["--input", str(indir), "--output", str(outdir),
             "--calibrate_lens_distortion",
             "--checkerboard_height", str(self.BH),
             "--checkerboard_width", str(self.BW),
             "--visualize_detections"])
        pp.lens_distortion_calibration(args)

        with open(outdir / "lens_distortion.json") as f:
            calib = json.load(f)
        mtx = np.asarray(calib["mtx"])
        dist = np.asarray(calib["dist"]).ravel()
        # focal within 1%, principal point within ~5 px, k1/k2 recovered
        np.testing.assert_allclose(mtx[0, 0], 600.0, rtol=0.01)
        np.testing.assert_allclose(mtx[1, 1], 600.0, rtol=0.01)
        assert abs(mtx[0, 2] - 320.0) < 6 and abs(mtx[1, 2] - 240.0) < 6
        np.testing.assert_allclose(dist[0], -0.25, atol=0.01)
        np.testing.assert_allclose(dist[1], 0.08, atol=0.02)
        assert calib["roi"] == [0, 0, self.W, self.H]
        # detection visualizations were written for the found boards
        assert len(list((outdir / "detected").iterdir())) >= 5
