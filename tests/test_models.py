"""Model tests: shapes, init invariants, and parity with the reference
torch modules using identical weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import ModelConfig
from nonrigid_nerf_tpu.models import (
    init_nerf_params, nerf_mlp_apply, init_bending_params, bend_points,
    rigidity_mask_fn)
from nonrigid_nerf_tpu.ops.embedding import fourier_embed
from tests.conftest import requires_reference


CFG = ModelConfig(N_importance=64)


class TestInitInvariants:
    def test_bending_starts_at_identity(self):
        params = init_bending_params(jax.random.PRNGKey(0), CFG)
        pts = jnp.asarray(np.random.RandomState(0).randn(4, 8, 3),
                          dtype=jnp.float32)
        lat = jnp.asarray(np.random.RandomState(1).randn(4, 8, 32),
                          dtype=jnp.float32)
        bent, details = bend_points(params, pts, lat)
        np.testing.assert_array_equal(np.asarray(bent), np.asarray(pts))
        np.testing.assert_array_equal(
            np.asarray(details["unmasked_offsets"]), 0.0)
        # rigidity starts exactly at 0.5 (zero-init final layer, tanh(0))
        np.testing.assert_array_equal(
            np.asarray(details["rigidity_mask"]), 0.5)

    def test_nerf_param_shapes(self):
        params = init_nerf_params(jax.random.PRNGKey(0), CFG)
        assert len(params["pts"]) == 8
        assert params["pts"][0]["w"].shape == (63, 256)
        # skip concat at layer index 4 -> layer 5 input is 256+63
        assert params["pts"][5]["w"].shape == (256 + 63, 256)
        assert params["output"]["w"].shape == (256, 5)

    def test_viewdirs_param_shapes(self):
        cfg = ModelConfig(use_viewdirs=True, N_importance=64)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        assert params["alpha"]["w"].shape == (256, 1)
        assert params["feature"]["w"].shape == (256, 256)
        assert params["views"][0]["w"].shape == (27 + 256, 128)
        assert params["rgb"]["w"].shape == (128, 3)

    def test_time_conditioned_baseline_shapes(self):
        cfg = ModelConfig(ray_bending=None, time_conditioned_baseline=True,
                          N_importance=64)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        assert params["pts"][0]["w"].shape == (63 + 32, 256)
        x = fourier_embed(jnp.ones((5, 2, 3)), 10)
        lat = jnp.ones((5, 2, 32))
        raw = nerf_mlp_apply(params, cfg, x, latents=lat)
        assert raw.shape == (5, 2, 4)


def _torch_linear_to_pytree(linear):
    import torch
    layer = {"w": jnp.asarray(linear.weight.detach().numpy().T)}
    if linear.bias is not None:
        layer["b"] = jnp.asarray(linear.bias.detach().numpy())
    return layer


@requires_reference
class TestReferenceParity:
    def test_nerf_mlp_no_viewdirs(self, reference_helpers):
        import torch
        torch.manual_seed(0)
        ref = reference_helpers.NeRF(
            D=8, W=256, input_ch=63, input_ch_views=0, output_ch=5,
            skips=[4], use_viewdirs=False, ray_bender=None,
            ray_bending_latent_size=32)
        params = {
            "pts": [_torch_linear_to_pytree(l) for l in ref.pts_linears],
            "output": _torch_linear_to_pytree(ref.output_linear),
        }
        x = np.random.RandomState(0).randn(128, 63).astype(np.float32)
        lat = np.zeros((128, 32), np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(
                np.concatenate([x, lat], -1))).numpy()
        ours = np.asarray(nerf_mlp_apply(params, CFG, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref_out[:, :4], atol=2e-5)

    def test_nerf_mlp_with_viewdirs(self, reference_helpers):
        import torch
        torch.manual_seed(1)
        cfg = ModelConfig(use_viewdirs=True, N_importance=64)
        ref = reference_helpers.NeRF(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=[4], use_viewdirs=True, ray_bender=None,
            ray_bending_latent_size=32)
        params = {
            "pts": [_torch_linear_to_pytree(l) for l in ref.pts_linears],
            "feature": _torch_linear_to_pytree(ref.feature_linear),
            "alpha": _torch_linear_to_pytree(ref.alpha_linear),
            "views": [_torch_linear_to_pytree(l) for l in ref.views_linears],
            "rgb": _torch_linear_to_pytree(ref.rgb_linear),
        }
        rng = np.random.RandomState(2)
        x = rng.randn(64, 63).astype(np.float32)
        v = rng.randn(64, 27).astype(np.float32)
        lat = np.zeros((64, 32), np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(
                np.concatenate([x, v, lat], -1))).numpy()
        ours = np.asarray(nerf_mlp_apply(
            params, cfg, jnp.asarray(x), jnp.asarray(v)))
        np.testing.assert_allclose(ours, ref_out, atol=2e-5)

    def test_ray_bending(self, reference_helpers):
        import torch
        torch.manual_seed(2)
        ref = reference_helpers.ray_bending(
            63, 32, "simple_neural", embed_fn=lambda x: x)
        # copy weights; randomize the zero-init output layers so the parity
        # check exercises a nontrivial deformation + rigidity field
        with torch.no_grad():
            ref.network[-1].weight.normal_(0, 0.1)
            ref.rigidity_network[-1].weight.normal_(0, 0.5)
            ref.rigidity_network[-1].bias.normal_(0, 0.5)
        params = {
            "bend": [_torch_linear_to_pytree(l) for l in ref.network],
            "rigidity": [_torch_linear_to_pytree(l)
                         for l in ref.rigidity_network],
        }
        rng = np.random.RandomState(3)
        pts = rng.randn(256, 3).astype(np.float32)
        lat = rng.randn(256, 32).astype(np.float32)
        with torch.no_grad():
            ref_bent = ref(torch.from_numpy(pts), torch.from_numpy(lat)).numpy()
            ref_details = ref(torch.from_numpy(pts), torch.from_numpy(lat),
                              special_loss_return=True)
        bent, details = bend_points(params, jnp.asarray(pts), jnp.asarray(lat))
        np.testing.assert_allclose(np.asarray(bent), ref_bent, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(details["unmasked_offsets"]),
            ref_details["unmasked_offsets"].detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(details["rigidity_mask"]),
            ref_details["rigidity_mask"].detach().numpy(), atol=1e-5)

    def test_scene_edit_hooks(self, reference_helpers):
        import torch
        torch.manual_seed(3)
        ref = reference_helpers.ray_bending(
            63, 32, "simple_neural", embed_fn=lambda x: x)
        with torch.no_grad():
            ref.network[-1].weight.normal_(0, 0.1)
            ref.rigidity_network[-1].weight.normal_(0, 0.5)
        ref.rigidity_test_time_cutoff = 0.5
        ref.test_time_scaling = 2.0
        params = {
            "bend": [_torch_linear_to_pytree(l) for l in ref.network],
            "rigidity": [_torch_linear_to_pytree(l)
                         for l in ref.rigidity_network],
        }
        rng = np.random.RandomState(4)
        pts = rng.randn(64, 3).astype(np.float32)
        lat = rng.randn(64, 32).astype(np.float32)
        with torch.no_grad():
            ref_bent = ref(torch.from_numpy(pts), torch.from_numpy(lat)).numpy()
        bent, _ = bend_points(params, jnp.asarray(pts), jnp.asarray(lat),
                              rigidity_test_time_cutoff=0.5,
                              test_time_scaling=2.0)
        np.testing.assert_allclose(np.asarray(bent), ref_bent, atol=1e-5)


class TestSirenBending:
    def test_siren_forward_runs_and_differs(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, bending_activation="sin")
        params = init_bending_params(jax.random.PRNGKey(0), cfg)
        # un-zero output layer so the activation choice matters
        params["bend"][-1]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(1), params["bend"][-1]["w"].shape)
        pts = jnp.asarray(np.random.RandomState(0).randn(32, 3),
                          dtype=jnp.float32)
        lat = jnp.asarray(np.random.RandomState(1).randn(32, 32),
                          dtype=jnp.float32)
        bent_sin, _ = bend_points(params, pts, lat, activation="sin")
        bent_relu, _ = bend_points(params, pts, lat, activation="relu")
        assert np.isfinite(np.asarray(bent_sin)).all()
        assert not np.allclose(np.asarray(bent_sin), np.asarray(bent_relu))

    @requires_reference
    def test_siren_parity_with_reference(self, reference_helpers):
        import torch
        torch.manual_seed(5)
        ref = reference_helpers.ray_bending(
            63, 32, "simple_neural", embed_fn=lambda x: x)
        # switch the reference's dormant sin branch on for the forward pass
        ref.activation_function = torch.sin
        with torch.no_grad():
            ref.network[-1].weight.normal_(0, 0.1)
        from tests.test_models import _torch_linear_to_pytree
        params = {
            "bend": [_torch_linear_to_pytree(l) for l in ref.network],
            "rigidity": [_torch_linear_to_pytree(l)
                         for l in ref.rigidity_network],
        }
        rng = np.random.RandomState(6)
        pts = rng.randn(64, 3).astype(np.float32)
        lat = rng.randn(64, 32).astype(np.float32)
        with torch.no_grad():
            ref_bent = ref(torch.from_numpy(pts),
                           torch.from_numpy(lat)).numpy()
        bent, _ = bend_points(params, jnp.asarray(pts), jnp.asarray(lat),
                              activation="sin")
        np.testing.assert_allclose(np.asarray(bent), ref_bent, atol=1e-5)
