"""Visualization + metrics utility tests."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest

from nonrigid_nerf_tpu.utils.metrics import psnr, ssim
from nonrigid_nerf_tpu.utils.viz import (disparity_to_blinn_phong,
                                         disparity_to_jet,
                                         export_ray_bending_objs)


class TestMetrics:
    def test_psnr_known_value(self):
        gt = np.zeros((8, 8, 3))
        gen = np.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(psnr(gt, gen), 20.0, atol=1e-6)

    def test_ssim_identity(self):
        rng = np.random.RandomState(0)
        img = rng.rand(32, 40, 3)
        assert ssim(img, img) == pytest.approx(1.0, abs=1e-7)

    def test_ssim_orders_degradations(self):
        rng = np.random.RandomState(1)
        img = rng.rand(48, 48, 3)
        slightly = np.clip(img + 0.05 * rng.randn(*img.shape), 0, 1)
        heavily = np.clip(img + 0.4 * rng.randn(*img.shape), 0, 1)
        s1 = ssim(img, slightly)
        s2 = ssim(img, heavily)
        assert 1.0 > s1 > s2 > 0.0

    def test_ssim_full_map_shape(self):
        rng = np.random.RandomState(2)
        a, b = rng.rand(24, 30, 3), rng.rand(24, 30, 3)
        val, smap = ssim(a, b, full=True)
        assert smap.shape == (24, 30, 3)
        assert np.isfinite(val)

    def test_ssim_finite_on_images_smaller_than_window(self):
        """Images smaller than the 11x11 gaussian window (e.g. tiny test
        scenes) must yield a defined value, not a NaN from an empty crop."""
        rng = np.random.RandomState(4)
        a, b = rng.rand(10, 12, 3), rng.rand(10, 12, 3)
        assert np.isfinite(ssim(a, b))
        assert ssim(a, a) == pytest.approx(1.0, abs=1e-7)

    def test_ssim_matches_naive_direct_computation(self):
        """Golden check that always runs (skimage is absent in this image):
        an obviously-correct direct per-pixel window implementation of the
        same protocol (gaussian weights sigma=1.5, truncate=3.5, replicate
        padding, no sample covariance, border crop) must agree exactly."""
        sigma, truncate = 1.5, 3.5
        r = int(truncate * sigma + 0.5)
        k1 = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
        k1 /= k1.sum()
        win = np.outer(k1, k1)                        # 11x11 gaussian
        C1, C2 = 0.01 ** 2, 0.03 ** 2

        rng = np.random.RandomState(5)
        H, W = 18, 16
        x = rng.rand(H, W)
        y = np.clip(x + 0.1 * rng.randn(H, W), 0, 1)

        xp = np.pad(x, r, mode="edge")
        yp = np.pad(y, r, mode="edge")
        vals = np.empty((H, W))
        for i in range(H):
            for j in range(W):
                wx = xp[i:i + 2 * r + 1, j:j + 2 * r + 1]
                wy = yp[i:i + 2 * r + 1, j:j + 2 * r + 1]
                mx, my = (win * wx).sum(), (win * wy).sum()
                vx = (win * wx * wx).sum() - mx ** 2
                vy = (win * wy * wy).sum() - my ** 2
                cxy = (win * wx * wy).sum() - mx * my
                vals[i, j] = ((2 * mx * my + C1) * (2 * cxy + C2)) / (
                    (mx ** 2 + my ** 2 + C1) * (vx + vy + C2))
        expected_mean = vals[r:-r, r:-r].mean()

        got_mean, got_map = ssim(x, y, full=True)
        np.testing.assert_allclose(got_map[..., 0], vals, atol=1e-10)
        np.testing.assert_allclose(got_mean, expected_mean, atol=1e-10)

    @pytest.mark.skipif(
        not pytest.importorskip("importlib.util").find_spec("skimage"),
        reason="skimage not installed")
    def test_ssim_matches_skimage(self):
        from skimage.metrics import structural_similarity
        rng = np.random.RandomState(3)
        a, b = rng.rand(32, 32, 3), rng.rand(32, 32, 3)
        ref = structural_similarity(a, b, data_range=1.0, channel_axis=-1,
                                    gaussian_weights=True, sigma=1.5,
                                    use_sample_covariance=False)
        np.testing.assert_allclose(ssim(a, b), ref, atol=1e-3)


class TestViz:
    def test_jet_range_and_shape(self):
        v = np.linspace(0, 1, 256).reshape(16, 16)
        rgb = disparity_to_jet(v)
        assert rgb.shape == (16, 16, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        # blue at 0, red at 1 for jet
        assert rgb[0, 0, 2] > rgb[0, 0, 0]
        assert rgb[15, 15, 0] > rgb[15, 15, 2]

    def test_blinn_phong_shape_finite(self):
        rng = np.random.RandomState(0)
        depth = rng.rand(20, 24)
        out = disparity_to_blinn_phong(depth)
        assert out.shape == (20, 24, 3)
        assert np.isfinite(out).all()

    def test_obj_export(self, tmp_path):
        rng = np.random.RandomState(0)
        initial = rng.randn(5, 4, 3)
        bent = initial + 0.1
        prefix = os.path.join(tmp_path, "rays")
        export_ray_bending_objs(initial, bent, prefix, subsample=3)
        for suffix in ("_bent.obj", "_not_bent.obj", "_deltas.obj"):
            path = prefix + suffix
            assert os.path.exists(path)
            content = open(path).read()
            assert content.startswith("v ")
            assert "\nf " in content


class TestPlotMetrics:
    def test_cli_renders_png(self, tmp_path):
        """tools/plot_metrics.py turns a metrics.jsonl stream (train +
        val rows, the schema train.py emits) into a PNG."""
        import json
        import subprocess
        import sys
        logs = tmp_path / "exp" / "logs"
        logs.mkdir(parents=True)
        stream = logs / "metrics.jsonl"
        with open(stream, "w") as f:
            for step in range(100, 600, 100):
                f.write(json.dumps({
                    "step": step, "it_per_sec": 75.0,
                    "loss": 1.0 / step, "psnr": 20 + step / 100,
                    "img_loss0": 0.5 / step, "offsets_loss": 1e-5,
                    "divergence_loss": 1e-4}) + "\n")
                f.write(json.dumps({"step": step, "val_view": 0,
                                    "val_psnr": 19 + step / 100}) + "\n")
        out = tmp_path / "curves.png"
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/plot_metrics.py"),
             str(stream), "-o", str(out)],
            capture_output=True, text=True, cwd=REPO)
        assert res.returncode == 0, res.stderr
        assert out.exists() and out.stat().st_size > 1000
