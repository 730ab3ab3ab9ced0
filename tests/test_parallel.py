"""Multi-device tests on the virtual 8-device CPU mesh.

The key correctness property (the TPU replacement for DataParallel
correctness, SURVEY.md §4): the sharded step's psum of per-device
masked-sum gradients (normalized by the global batch) equals the
single-device gradient of the union of all device sub-batches — asserted
leaf-by-leaf below by reconstructing each device's fold_in sub-batch, plus
the parallel renderer matching the single-device renderer exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.engine.render import make_ray_renderer
from nonrigid_nerf_tpu.engine.train_state import create_train_state
from nonrigid_nerf_tpu.engine.train_step import make_train_step
from nonrigid_nerf_tpu.parallel import (make_mesh, make_parallel_train_step,
                                        make_parallel_renderer)
from tests.test_train_step import TINY, build_tiny_dataset


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


class TestParallelTrainStep:
    def test_runs_and_improves(self, tmp_path):
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=128, lrate=5e-3, warmup_steps=10,
                         offsets_loss_weight=60.0, divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=300)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        mesh = make_mesh()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                           has_test_split=False)
        key = jax.random.PRNGKey(42)
        first = None
        for i in range(60):
            state, metrics = step_fn(state, ds, key)
            if i == 0:
                first = float(metrics["img_loss"])
        last = float(metrics["img_loss"])
        assert np.isfinite(last)
        assert last < first, (first, last)

    def test_params_stay_replicated(self, tmp_path):
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=64, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        mesh = make_mesh()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                           has_test_split=False, donate=False)
        state2, _ = step_fn(state, ds, jax.random.PRNGKey(1))
        w = state2.params["coarse"]["pts"][0]["w"]
        # fully-addressable and identical on all devices
        vals = [np.asarray(s.data) for s in w.addressable_shards]
        for v in vals[1:]:
            np.testing.assert_array_equal(vals[0], v)

    @staticmethod
    def _union_batch(key, ds, n_dev, local_rand):
        """The union of the device shards under the topology-invariant
        sampling (parallel/mesh.py _local_step: every device samples the
        GLOBAL batch with the shared step-folded key and slices its
        contiguous shard) — i.e. simply the global batch, derived exactly
        like the single-device train_step derives its own."""
        from nonrigid_nerf_tpu.data.dataset import sample_ray_batch
        k_batch, _, _ = jax.random.split(jax.random.fold_in(key, 0), 3)
        return sample_ray_batch(k_batch, ds, n_dev * local_rand)

    @staticmethod
    def _union_vjp(state, ds, union, tc, rs):
        """Plain single-device jax.vjp of the per-ray losses over the union
        batch; returns (vjp_fn, n_rand)."""
        from nonrigid_nerf_tpu.engine.losses import per_ray_losses
        from nonrigid_nerf_tpu.engine.render import render_rays

        def losses_fn(params):
            latents = params["latents"][union["timestep_ids"]]
            out = render_rays(params, TINY, rs, union["rays_o"],
                              union["rays_d"], latents, key=None,
                              detailed=True)
            losses, _ = per_ray_losses(jax.random.PRNGKey(0), params, TINY,
                                       tc, out, union["target_rgb"], latents,
                                       0)
            return losses

        _, vjp_fn = jax.vjp(losses_fn, state.params)
        return vjp_fn

    @staticmethod
    def _perturb_params(params):
        """Make gradients non-trivial everywhere: lift the density bias (at
        init the raw density is negative at every sample point, so relu
        zeroes all coarse-network gradients) and un-zero the bending output
        layer."""
        for net in ("coarse", "fine"):
            params[net]["output"]["b"] = \
                params[net]["output"]["b"].at[3].set(0.5)
        params["bender"]["bend"][-1]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), params["bender"]["bend"][-1]["w"].shape)
        return params

    @staticmethod
    def _grads_from_adam_state(new_state):
        """First Adam step from zero moments: mu1 = (1 - b1) * grad, so the
        exact psum'd gradient is recoverable from the updated opt state."""
        return jax.tree_util.tree_map(lambda m: m / 0.1,
                                      new_state.opt_state[0].mu)

    @staticmethod
    def _assert_trees_close(tree_a, tree_b, rtol=5e-5, atol=1e-7):
        leaves_a = jax.tree_util.tree_flatten_with_path(tree_a)[0]
        leaves_b = jax.tree_util.tree_flatten_with_path(tree_b)[0]
        assert len(leaves_a) == len(leaves_b)
        for (path, a), (_, b) in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
                err_msg=jax.tree_util.keystr(path))

    def test_gradient_equivalence_with_single_device(self, tmp_path):
        """The mathematical core of the multi-chip design (parallel/mesh.py:
        7-12,83-91): the psum over devices of per-device masked-sum
        gradients normalized by the GLOBAL batch equals the single-device
        gradient of the union batch. Deterministic render settings
        (perturb=0, no density noise, no Hutchinson term) make the
        per-device render/loss keys inert, so the equality is exact up to
        f32 summation order."""
        ds = build_tiny_dataset(tmp_path)
        n_dev = len(jax.devices())
        assert n_dev == 8
        n_rand = 8 * n_dev
        tc = TrainConfig(N_rand=n_rand, N_iters=100, offsets_loss_weight=60.0,
                         rigidity_loss_weight=5e-4)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            perturb=0.0, raw_noise_std=0.0)
        mesh = make_mesh()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        self._perturb_params(state.params)

        key = jax.random.PRNGKey(5)
        step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                           has_test_split=False, donate=False)
        s_par, _ = step_fn(state, ds, key)
        grads_par = self._grads_from_adam_state(s_par)

        union = self._union_batch(key, ds, n_dev, n_rand // n_dev)
        vjp_fn = self._union_vjp(state, ds, union, tc, rs)
        grads_union, = vjp_fn(union["train_indicator"] / n_rand)

        # sanity: the batch is non-degenerate and gradients are non-trivial
        assert float(jnp.abs(grads_union["latents"]).max()) > 0
        assert float(jnp.abs(
            grads_union["coarse"]["pts"][0]["w"]).max()) > 0
        self._assert_trees_close(grads_par, grads_union)

    def test_gradient_equivalence_two_phase(self, tmp_path):
        """Same equivalence under has_test_split: network gradients come from
        the train cotangent only, latent gradients from train + test
        cotangents (reference two-phase backward, train.py:1594-1608)."""
        ds = build_tiny_dataset(tmp_path, train_block=1, test_block=1)
        assert float(ds.test_indicator.sum()) > 0
        n_dev = len(jax.devices())
        n_rand = 8 * n_dev
        tc = TrainConfig(N_rand=n_rand, N_iters=100, offsets_loss_weight=60.0,
                         rigidity_loss_weight=5e-4)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            perturb=0.0, raw_noise_std=0.0)
        mesh = make_mesh()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        self._perturb_params(state.params)

        key = jax.random.PRNGKey(6)
        step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                           has_test_split=True, donate=False)
        s_par, _ = step_fn(state, ds, key)
        grads_par = self._grads_from_adam_state(s_par)

        union = self._union_batch(key, ds, n_dev, n_rand // n_dev)
        assert float(union["test_indicator"].sum()) > 0
        vjp_fn = self._union_vjp(state, ds, union, tc, rs)
        train_grads, = vjp_fn(union["train_indicator"] / n_rand)
        test_grads, = vjp_fn(union["test_indicator"] / n_rand)
        expected = {**train_grads,
                    "latents": train_grads["latents"]
                    + test_grads["latents"]}

        self._assert_trees_close(grads_par, expected)
        # latent isolation: test rays must contribute to latents only
        assert float(jnp.abs(test_grads["latents"]).max()) > 0

    def test_test_split_isolation_parallel(self, tmp_path):
        ds = build_tiny_dataset(tmp_path, train_block=1, test_block=1)
        ds = dataclasses.replace(
            ds, train_indicator=jnp.zeros_like(ds.train_indicator),
            test_indicator=jnp.ones_like(ds.test_indicator))
        tc = TrainConfig(N_rand=64, N_iters=100, offsets_loss_weight=60.0)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        mesh = make_mesh()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        state.params["bender"]["bend"][-1]["w"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(9), state.params["bender"]["bend"][-1]["w"].shape)
        step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                           has_test_split=True, donate=False)
        new_state, _ = step_fn(state, ds, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(
            np.asarray(new_state.params["coarse"]["pts"][0]["w"]),
            np.asarray(state.params["coarse"]["pts"][0]["w"]))
        assert float(jnp.abs(new_state.params["latents"]
                             - state.params["latents"]).max()) > 0


class TestParallelRenderer:
    def test_matches_single_device(self, tmp_path):
        from tests.test_engine import make_params, make_ray_batch
        params = make_params(TINY, randomize_bender=True)
        ro, rd, lat = make_ray_batch(n=100, latent=4)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0)
        mesh = make_mesh()
        par = make_parallel_renderer(TINY, rs, mesh, chunk=8)
        out_p = par(params, ro, rd, lat)
        single = make_ray_renderer(TINY, rs, chunk=8, jit=False)
        out_s = single(params, ro, rd, lat, None)
        np.testing.assert_allclose(np.asarray(out_p["rgb_map"]),
                                   np.asarray(out_s["rgb_map"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_p["disp_map"]),
                                   np.asarray(out_s["disp_map"]), atol=1e-4)
        assert out_p["rgb_map"].shape == (100, 3)

    def test_detailed_postprocess_matches_single_device(self):
        """The FVR surface-extraction postprocess must run per-device inside
        the sharded renderer and gather to the same maps as single-device."""
        import free_viewpoint_rendering as fvr
        from tests.test_engine import make_params, make_ray_batch
        params = make_params(TINY, randomize_bender=True)
        ro, rd, lat = make_ray_batch(n=50, latent=4)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0)
        mesh = make_mesh()
        par = make_parallel_renderer(TINY, rs, mesh, chunk=8, detailed=True,
                                     postprocess=fvr._surface_post)
        out_p = par(params, ro, rd, lat)
        single = make_ray_renderer(TINY, rs, chunk=8, jit=False,
                                   detailed=True,
                                   postprocess=fvr._surface_post)
        out_s = single(params, ro, rd, lat, None)
        assert set(out_p) == set(out_s)
        assert "surface_points" in out_p and "surface_rigidity" in out_p
        for k in out_s:
            np.testing.assert_allclose(np.asarray(out_p[k]),
                                       np.asarray(out_s[k]), atol=1e-5,
                                       err_msg=k)

    def test_render_path_app_uses_mesh_and_matches(self, tmp_path):
        """apps.render_path must produce identical frames whether its
        auto-renderer shards over the 8-device mesh or a single-device
        renderer is injected."""
        from nonrigid_nerf_tpu.apps.render_path import render_path
        from tests.test_engine import make_params
        params = make_params(TINY, randomize_bender=True)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0)
        intrin = {"height": 10, "width": 12, "focal_x": 20.0, "focal_y": 20.0,
                  "center_x": 6.0, "center_y": 5.0}
        pose = np.eye(4)[:3]
        latents = np.zeros((1, 4), np.float32)
        assert len(jax.devices()) == 8
        rgbs_mesh, disps_mesh = render_path(
            params, TINY, rs, [pose], [intrin], latents, chunk=16,
            verbose=False)

        single = make_ray_renderer(TINY, rs.test_mode(), chunk=16, jit=False)

        def single_renderer(p, ro, rd, lat, key=None):
            return single(p, ro, rd, lat, key)

        rgbs_s, disps_s = render_path(
            params, TINY, rs, [pose], [intrin], latents, chunk=16,
            renderer=single_renderer, verbose=False)
        np.testing.assert_allclose(rgbs_mesh, rgbs_s, atol=1e-5)
        np.testing.assert_allclose(disps_mesh, disps_s, atol=1e-4)


class TestDeviceCountInvariance:
    """Topology invariance of the training trajectory (VERDICT r2 item 5).

    The sharded step samples the GLOBAL batch on every device and slices a
    contiguous shard (parallel/mesh.py _local_step), so with deterministic
    render settings the multi-step loss trajectory and final parameters are
    the same for ANY mesh size — and equal to the plain single-device
    train_step, whose k_batch derivation it matches. The only cross-size
    difference is the psum association order (f32 noise)."""

    N_STEPS = 20

    def _run(self, n_dev, ds, tc, rs):
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        for net in ("coarse", "fine"):
            state.params[net]["output"]["b"] = \
                state.params[net]["output"]["b"].at[3].set(0.5)
        key = jax.random.PRNGKey(3)
        if n_dev == 0:   # the plain single-device engine step
            step_fn = make_train_step(TINY, tc, rs, has_test_split=False,
                                      donate=False)
        else:
            mesh = make_mesh(jax.devices()[:n_dev])
            step_fn = make_parallel_train_step(TINY, tc, rs, mesh,
                                               has_test_split=False,
                                               donate=False)
        losses = []
        for _ in range(self.N_STEPS):
            state, metrics = step_fn(state, ds, key)
            losses.append(float(metrics["loss"]))
        return np.asarray(losses), state.params

    def test_trajectory_invariant_across_mesh_sizes(self, tmp_path):
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=64, N_iters=100, lrate=5e-3,
                         offsets_loss_weight=60.0, rigidity_loss_weight=5e-4)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            perturb=0.0, raw_noise_std=0.0)

        ref_losses, ref_params = self._run(1, ds, tc, rs)
        assert np.all(np.isfinite(ref_losses))
        for n_dev in (0, 2, 4, 8):
            losses, params = self._run(n_dev, ds, tc, rs)
            np.testing.assert_allclose(
                losses, ref_losses, rtol=2e-4,
                err_msg=f"loss trajectory diverged at n_dev={n_dev}")
            for (path, a), (_, b) in zip(
                    jax.tree_util.tree_flatten_with_path(params)[0],
                    jax.tree_util.tree_flatten_with_path(ref_params)[0]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                    err_msg=f"n_dev={n_dev} {jax.tree_util.keystr(path)}")

    def test_step0_batch_content_identical(self, tmp_path):
        """The pixel selection itself is bitwise-identical across mesh
        sizes: the union of device shards equals the global batch."""
        from nonrigid_nerf_tpu.data.dataset import sample_ray_batch
        ds = build_tiny_dataset(tmp_path)
        key = jax.random.PRNGKey(3)
        k_batch, _, _ = jax.random.split(jax.random.fold_in(key, 0), 3)
        gbatch = sample_ray_batch(k_batch, ds, 64)
        for n_dev in (2, 4, 8):
            local = 64 // n_dev
            shards = [jax.tree_util.tree_map(
                lambda x: x[i * local:(i + 1) * local], gbatch)
                for i in range(n_dev)]
            union = {f: jnp.concatenate([s[f] for s in shards])
                     for f in gbatch}
            for f in gbatch:
                np.testing.assert_array_equal(np.asarray(union[f]),
                                              np.asarray(gbatch[f]), f)
