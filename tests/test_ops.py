"""Unit + parity tests for the core math ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonrigid_nerf_tpu.ops import (
    fourier_embed, make_embedder, get_rays, pixel_rays,
    stratified_z_vals, sample_pdf, raw2outputs,
    img2mse, mse2psnr, safe_norm,
)
from tests.conftest import requires_reference


class TestEmbedding:
    def test_output_dim(self):
        embed, out_dim = make_embedder(multires=10)
        x = jnp.ones((7, 3))
        assert out_dim == 63
        assert embed(x).shape == (7, 63)

    def test_identity(self):
        embed, out_dim = make_embedder(multires=10, i_embed=-1)
        x = jnp.arange(6.0).reshape(2, 3)
        assert out_dim == 3
        np.testing.assert_array_equal(embed(x), x)

    def test_raw_input_first_channels(self):
        # ray bending depends on raw xyz being the first 3 channels
        x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        out = fourier_embed(jnp.asarray(x), num_freqs=10)
        np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)

    def test_channel_order_golden(self):
        # [x, sin(x), cos(x), sin(2x), cos(2x), ...]
        x = jnp.array([[0.3, -0.7, 1.1]])
        out = np.asarray(fourier_embed(x, num_freqs=2))
        expected = np.concatenate([
            np.asarray(x),
            np.sin(np.asarray(x)), np.cos(np.asarray(x)),
            np.sin(2 * np.asarray(x)), np.cos(2 * np.asarray(x)),
        ], axis=-1)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    @requires_reference
    def test_parity_with_reference(self, reference_helpers):
        import torch
        ref_embed, ref_dim = reference_helpers.get_embedder(10, 0)
        x = np.random.RandomState(1).randn(64, 3).astype(np.float32)
        ref = ref_embed(torch.from_numpy(x)).numpy()
        ours = np.asarray(fourier_embed(jnp.asarray(x), num_freqs=10))
        assert ref_dim == 63
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRays:
    def test_shapes_and_origin(self):
        c2w = jnp.eye(4)[:3]
        intrin = dict(height=4, width=6, focal_x=10.0, focal_y=10.0,
                      center_x=3.0, center_y=2.0)
        rays_o, rays_d = get_rays(c2w, intrin)
        assert rays_o.shape == (4, 6, 3)
        assert rays_d.shape == (4, 6, 3)
        np.testing.assert_array_equal(rays_o, np.zeros((4, 6, 3)))
        # center pixel points straight down -z
        np.testing.assert_allclose(rays_d[2, 3], [0.0, 0.0, -1.0], atol=1e-6)

    def test_pixel_rays_matches_grid(self):
        rng = np.random.RandomState(2)
        c2w = jnp.asarray(np.concatenate(
            [np.linalg.qr(rng.randn(3, 3))[0], rng.randn(3, 1)], axis=1),
            dtype=jnp.float32)
        intrin = dict(height=5, width=7, focal_x=11.0, focal_y=9.0,
                      center_x=3.5, center_y=2.5)
        full_o, full_d = get_rays(c2w, intrin)
        x = jnp.array([0.0, 6.0, 3.0])
        y = jnp.array([0.0, 4.0, 2.0])
        o, d = pixel_rays(c2w, x, y, 11.0, 9.0, 3.5, 2.5)
        for i, (xi, yi) in enumerate([(0, 0), (6, 4), (3, 2)]):
            np.testing.assert_allclose(o[i], full_o[yi, xi], atol=1e-6)
            np.testing.assert_allclose(d[i], full_d[yi, xi], atol=1e-6)

    @requires_reference
    def test_parity_with_reference_numpy(self, reference_helpers):
        rng = np.random.RandomState(3)
        c2w = np.concatenate(
            [np.linalg.qr(rng.randn(3, 3))[0], rng.randn(3, 1)],
            axis=1).astype(np.float32)
        intrin = dict(height=8, width=10, focal_x=12.0, focal_y=14.0,
                      center_x=5.0, center_y=4.0)
        ref_o, ref_d = reference_helpers.get_rays_np(c2w, intrin)
        our_o, our_d = get_rays(jnp.asarray(c2w), intrin)
        np.testing.assert_allclose(np.asarray(our_o), ref_o, atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_d), ref_d, atol=1e-5)


class TestStratifiedSampling:
    def test_deterministic_linear(self):
        z = stratified_z_vals(None, 2.0, 6.0, n_rays=3, n_samples=5,
                              perturb=0.0)
        np.testing.assert_allclose(
            z, np.tile(np.linspace(2.0, 6.0, 5), (3, 1)), atol=1e-6)

    def test_lindisp(self):
        z = stratified_z_vals(None, 1.0, 4.0, n_rays=1, n_samples=3,
                              lindisp=True, perturb=0.0)
        np.testing.assert_allclose(z[0], [1.0, 1.6, 4.0], atol=1e-5)

    def test_jitter_stays_in_bins(self):
        key = jax.random.PRNGKey(0)
        z0 = stratified_z_vals(None, 2.0, 6.0, 64, 16, perturb=0.0)
        z = stratified_z_vals(key, 2.0, 6.0, 64, 16, perturb=1.0)
        mids = 0.5 * (z0[..., 1:] + z0[..., :-1])
        lower = np.concatenate([z0[..., :1], mids], -1)
        upper = np.concatenate([mids, z0[..., -1:]], -1)
        assert np.all(np.asarray(z) >= lower - 1e-6)
        assert np.all(np.asarray(z) <= upper + 1e-6)


class TestSamplePdf:
    def test_deterministic_uniform_weights(self):
        # uniform pdf -> deterministic samples are evenly spaced in bins
        bins = jnp.linspace(0.0, 1.0, 5)[None, :].repeat(2, 0)   # 5 bins
        weights = jnp.ones((2, 4))
        s = sample_pdf(None, bins, weights, 9, det=True)
        np.testing.assert_allclose(
            np.asarray(s), np.tile(np.linspace(0, 1, 9), (2, 1)), atol=1e-4)

    def test_concentrated_pdf(self):
        # all weight in one bin -> all samples land inside that bin
        bins = jnp.linspace(0.0, 1.0, 6)[None, :]
        weights = jnp.array([[0.0, 0.0, 1000.0, 0.0, 0.0]])
        s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 32))
        assert np.all(s >= 0.4 - 1e-3) and np.all(s <= 0.6 + 1e-3)

    def test_analytic_cdf_inversion(self):
        # pdf proportional to [1, 3] over two bins: cdf hits 0.25 at the
        # first bin edge
        bins = jnp.array([[0.0, 1.0, 2.0]])
        weights = jnp.array([[1.0, 3.0]])
        s = np.asarray(sample_pdf(None, bins, weights, 5, det=True))
        # u = 0, .25, .5, .75, 1 -> z = 0, 1, 4/3, 5/3, 2
        np.testing.assert_allclose(
            s[0], [0.0, 1.0, 4.0 / 3.0, 5.0 / 3.0, 2.0], atol=1e-3)

    @requires_reference
    def test_parity_with_reference(self, reference_helpers):
        import torch
        if not hasattr(torch, "searchsorted"):
            pytest.skip("old torch")
        rng = np.random.RandomState(5)
        bins = np.sort(rng.rand(16, 63).astype(np.float32), axis=-1)
        weights = rng.rand(16, 62).astype(np.float32)

        # reference sample_pdf calls weights.get_device(); emulate its math
        # by monkeypatching torch.Tensor.get_device on CPU
        orig = torch.Tensor.get_device
        torch.Tensor.get_device = lambda self: "cpu"
        try:
            ref = reference_helpers.sample_pdf(
                torch.from_numpy(bins), torch.from_numpy(weights), 64,
                det=True).numpy()
        finally:
            torch.Tensor.get_device = orig
        ours = np.asarray(sample_pdf(None, jnp.asarray(bins),
                                     jnp.asarray(weights), 64, det=True))
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestRaw2Outputs:
    def test_golden_single_sample(self):
        # one sample with huge density -> fully opaque, rgb = sigmoid(logits)
        raw = jnp.array([[[0.5, -0.5, 2.0, 1e8]]])
        z_vals = jnp.array([[1.0]])
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        out = raw2outputs(raw, z_vals, rays_d)
        sig = 1.0 / (1.0 + np.exp(-np.array([0.5, -0.5, 2.0])))
        np.testing.assert_allclose(out.rgb_map[0], sig, atol=1e-5)
        np.testing.assert_allclose(out.acc_map[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out.depth_map[0], 1.0, atol=1e-5)

    def test_hand_computed_two_samples(self):
        sigma = np.array([0.7, 1.3])
        z = np.array([1.0, 1.5])
        dists = np.array([0.5, 1e10])
        alpha = 1.0 - np.exp(-sigma * dists)
        w = np.array([alpha[0], alpha[1] * (1.0 - alpha[0] + 1e-10)])
        raw = jnp.asarray(
            np.concatenate([np.zeros((1, 2, 3)),
                            sigma.reshape(1, 2, 1)], -1).astype(np.float32))
        out = raw2outputs(raw, jnp.asarray(z[None]), jnp.array([[0., 0., 1.]]))
        np.testing.assert_allclose(out.visibility_weights[0], w, rtol=1e-5)
        np.testing.assert_allclose(out.rgb_map[0], 0.5 * w.sum() * np.ones(3),
                                   rtol=1e-5)
        np.testing.assert_allclose(out.depth_map[0], (w * z).sum(), rtol=1e-5)

    def test_ray_norm_scales_dists(self):
        # doubling |rays_d| doubles effective distances -> higher alpha
        raw = jnp.zeros((1, 3, 4)).at[..., 3].set(1.0)
        z = jnp.array([[1.0, 2.0, 3.0]])
        a1 = raw2outputs(raw, z, jnp.array([[0., 0., 1.]])).opacity_alpha
        a2 = raw2outputs(raw, z, jnp.array([[0., 0., 2.]])).opacity_alpha
        assert float(a2[0, 0]) > float(a1[0, 0])
        np.testing.assert_allclose(float(a1[0, 0]), 1.0 - np.exp(-1.0),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(a2[0, 0]), 1.0 - np.exp(-2.0),
                                   rtol=1e-5)

    def test_white_background(self):
        raw = jnp.zeros((1, 2, 4))  # zero density -> transparent
        z = jnp.array([[1.0, 2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        out_b = raw2outputs(raw, z, d, white_bkgd=False)
        out_w = raw2outputs(raw, z, d, white_bkgd=True)
        np.testing.assert_allclose(out_b.rgb_map[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out_w.rgb_map[0], 1.0, atol=1e-6)


class TestMath:
    def test_img2mse_per_ray(self):
        pred = jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
        target = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        np.testing.assert_allclose(img2mse(pred, target, 2), [1.0, 0.0])

    def test_mse2psnr(self):
        np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0,
                                   atol=1e-4)

    def test_safe_norm_zero_gradient(self):
        g = jax.grad(lambda v: jnp.sum(safe_norm(v)))(jnp.zeros((4, 3)))
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_safe_norm_matches_norm(self):
        v = jnp.asarray(np.random.RandomState(0).randn(8, 3))
        np.testing.assert_allclose(safe_norm(v), np.linalg.norm(v, axis=-1),
                                   rtol=1e-6)
