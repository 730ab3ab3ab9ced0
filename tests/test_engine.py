"""Engine tests: render_rays structure, viewdirs variants, edits, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import (EditConfig, ModelConfig,
                                      RenderSettings, TrainConfig)
from nonrigid_nerf_tpu.engine import (render_rays, make_ray_renderer,
                                      per_ray_losses, divergence_loss,
                                      loss_schedule_factor)
from nonrigid_nerf_tpu.engine.query import query_points
from nonrigid_nerf_tpu.models import init_nerf_params, init_bending_params


def make_params(cfg, seed=0, randomize_bender=False):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    params = {"coarse": init_nerf_params(keys[0], cfg)}
    if cfg.N_importance > 0:
        params["fine"] = init_nerf_params(
            keys[1], cfg, cfg.netdepth_fine, cfg.netwidth_fine)
    if cfg.use_ray_bending:
        bender = init_bending_params(keys[2], cfg)
        if randomize_bender:
            # un-zero the output layers so deformation is nontrivial
            bender["bend"][-1]["w"] = 0.1 * jax.random.normal(
                keys[3], bender["bend"][-1]["w"].shape)
            if "rigidity" in bender:
                bender["rigidity"][-1]["w"] = 0.5 * jax.random.normal(
                    jax.random.PRNGKey(seed + 7),
                    bender["rigidity"][-1]["w"].shape)
        params["bender"] = bender
    return params


def make_ray_batch(n=16, latent=32, seed=0):
    rng = np.random.RandomState(seed)
    rays_o = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.randn(n, 3) * 0.1 + np.array([0, 0, -1.0])).astype(np.float32))
    latents = jnp.asarray(0.01 * rng.randn(n, latent).astype(np.float32))
    return rays_o, rays_d, latents


SMALL = ModelConfig(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                    skips=(), N_samples=8, N_importance=8,
                    bending_depth=3, bending_width=16, rigidity_depth=2,
                    rigidity_width=8)


class TestRenderRays:
    def test_output_shapes(self):
        params = make_params(SMALL)
        ro, rd, lat = make_ray_batch()
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0)
        out = render_rays(params, SMALL, rs, ro, rd, lat,
                          key=jax.random.PRNGKey(0), detailed=True)
        assert out["rgb_map"].shape == (16, 3)
        assert out["rgb0"].shape == (16, 3)
        assert out["visibility_weights"].shape == (16, 8)       # coarse
        assert out["fine_visibility_weights"].shape == (16, 16)  # 8 + 8
        assert out["unmasked_offsets"].shape == (16, 8, 3)
        assert out["rigidity_mask"].shape == (16, 8, 1)
        assert out["initial_input_pts"].shape == (16, 8, 3)

    def test_deterministic_when_no_perturb(self):
        params = make_params(SMALL)
        ro, rd, lat = make_ray_batch()
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0, raw_noise_std=0.0)
        o1 = render_rays(params, SMALL, rs, ro, rd, lat, key=None)
        o2 = render_rays(params, SMALL, rs, ro, rd, lat, key=None)
        np.testing.assert_array_equal(np.asarray(o1["rgb_map"]),
                                      np.asarray(o2["rgb_map"]))

    def test_coarse_only(self):
        cfg = ModelConfig(netdepth=2, netwidth=32, skips=(), N_samples=8,
                          N_importance=0, bending_depth=3, bending_width=16)
        params = make_params(cfg)
        ro, rd, lat = make_ray_batch()
        rs = RenderSettings(N_samples=8, N_importance=0, near=1.0, far=4.0)
        out = render_rays(params, cfg, rs, ro, rd, lat,
                          key=jax.random.PRNGKey(0))
        assert out["rgb_map"].shape == (16, 3)
        assert "rgb0" not in out

    def test_render_canonical_ignores_latents(self):
        params = make_params(SMALL, randomize_bender=True)
        ro, rd, lat = make_ray_batch()
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0)
        edit = EditConfig(render_canonical=True)
        o1 = render_rays(params, SMALL, rs, ro, rd, lat, edit=edit)
        o2 = render_rays(params, SMALL, rs, ro, rd, 5.0 + lat, edit=edit)
        np.testing.assert_array_equal(np.asarray(o1["rgb_map"]),
                                      np.asarray(o2["rgb_map"]))

    def test_foreground_removal_zeroes_density(self):
        params = make_params(SMALL, randomize_bender=True)
        ro, rd, lat = make_ray_batch()
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0)
        # threshold 0 -> all rigidity >= 0 -> all densities zeroed
        edit = EditConfig(nonrigid_object_removal_threshold=0.0)
        out = render_rays(params, SMALL, rs, ro, rd, lat, edit=edit)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)

    def test_viewdirs_variants_run_and_differ(self):
        outs = {}
        for approx in (True, False):
            cfg = ModelConfig(netdepth=2, netwidth=32, netdepth_fine=2,
                              netwidth_fine=32, skips=(), N_samples=8,
                              N_importance=8, use_viewdirs=True,
                              approx_nonrigid_viewdirs=approx,
                              bending_depth=3, bending_width=16)
            params = make_params(cfg, randomize_bender=True)
            # bias the density head positive so rays are not fully transparent
            for net in ("coarse", "fine"):
                params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
            ro, rd, lat = make_ray_batch()
            rs = RenderSettings(N_samples=8, N_importance=8, near=1.0,
                                far=4.0, perturb=0.0)
            out = render_rays(params, cfg, rs, ro, rd, lat)
            assert np.isfinite(np.asarray(out["rgb_map"])).all()
            outs[approx] = np.asarray(out["rgb_map"])
        # same weights, different viewdir estimates -> close but not equal
        assert not np.array_equal(outs[True], outs[False])

    def test_stage1_reuse_matches_full_fine_requery(self):
        """render_rays reuses the coarse samples' bend/encode results in the
        fine pass. Values AND gradients must match the reference behavior
        (re-querying the full sorted z union) to f32 exactness."""
        cfg = SMALL
        params = make_params(cfg, randomize_bender=True)
        ro, rd, lat = make_ray_batch(8)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            raw_noise_std=0.3)
        key = jax.random.PRNGKey(3)

        def losses(params):
            out = render_rays(params, cfg, rs, ro, rd, lat, key=key,
                              detailed=True)
            return (jnp.sum(out["rgb_map"] ** 2)
                    + jnp.sum(out["rgb0"] ** 2)
                    + jnp.sum(out["fine_unmasked_offsets"] ** 2)
                    + jnp.sum(out["fine_rigidity_mask"]))

        val_new, g_new = jax.value_and_grad(losses)(params)

        # reference computation: replicate the old fine pass explicitly
        from nonrigid_nerf_tpu.ops.compositing import raw2outputs
        from nonrigid_nerf_tpu.ops.sampling import (sample_pdf,
                                                    stratified_z_vals)

        def losses_ref(params):
            k_strat, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)
            z_vals = stratified_z_vals(k_strat, rs.near, rs.far, 8,
                                       rs.N_samples, perturb=rs.perturb)
            pts = ro[:, None, :] + rd[:, None, :] * z_vals[..., None]
            raw, det = query_points(params, cfg, pts, None, lat,
                                    detailed=True)
            coarse = raw2outputs(raw, z_vals, rd, rs.raw_noise_std,
                                 noise_key=k_noise0)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(k_pdf, z_mid,
                                   coarse.visibility_weights[..., 1:-1],
                                   rs.N_importance, det=(rs.perturb == 0.0))
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
            pts_fine = ro[:, None, :] + rd[:, None, :] * z_all[..., None]
            raw_f, det_f = query_points(params, cfg, pts_fine, None, lat,
                                        network="fine", detailed=True)
            fine = raw2outputs(raw_f, z_all, rd, rs.raw_noise_std,
                               noise_key=k_noise1)
            return (jnp.sum(fine.rgb_map ** 2)
                    + jnp.sum(coarse.rgb_map ** 2)
                    + jnp.sum(det_f["unmasked_offsets"] ** 2)
                    + jnp.sum(det_f["rigidity_mask"]))

        val_ref, g_ref = jax.value_and_grad(losses_ref)(params)
        np.testing.assert_allclose(float(val_new), float(val_ref),
                                   rtol=1e-6)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                jax.tree_util.tree_flatten_with_path(g_new)[0]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(path))

    @pytest.mark.parametrize("mode", ["fd", "exact", "nobender", "baseline"])
    def test_stage1_reuse_matches_requery_viewdirs(self, mode):
        """Viewdirs variants: the reuse fine pass (FD: sort-then-query;
        exact/straight dirs: query-then-sort) must equal the full re-query
        of the sorted z union (stage1_reuse=False, the reference-shaped
        computation) in values AND gradients."""
        import dataclasses
        kw = dict(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                  skips=(), N_samples=8, N_importance=8, use_viewdirs=True,
                  bending_depth=3, bending_width=16, rigidity_depth=2,
                  rigidity_width=8)
        if mode == "fd":
            kw.update(approx_nonrigid_viewdirs=True)
        elif mode == "exact":
            kw.update(approx_nonrigid_viewdirs=False)
        elif mode == "nobender":
            kw.update(ray_bending=None)
        else:
            kw.update(ray_bending=None, time_conditioned_baseline=True)
        cfg = ModelConfig(**kw)
        params = make_params(cfg, randomize_bender=True)
        ro, rd, lat = make_ray_batch(8)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            raw_noise_std=0.3)
        key = jax.random.PRNGKey(3)
        detailed = cfg.use_ray_bending

        def losses(params, cfg):
            out = render_rays(params, cfg, rs, ro, rd, lat, key=key,
                              detailed=detailed)
            total = jnp.sum(out["rgb_map"] ** 2) + jnp.sum(out["rgb0"] ** 2)
            if detailed:
                total = (total + jnp.sum(out["fine_unmasked_offsets"] ** 2)
                         + jnp.sum(out["fine_rigidity_mask"]))
            return total

        val_new, g_new = jax.value_and_grad(losses)(params, cfg)
        cfg_ref = dataclasses.replace(cfg, stage1_reuse=False)
        val_ref, g_ref = jax.value_and_grad(losses)(params, cfg_ref)
        np.testing.assert_allclose(float(val_new), float(val_ref), rtol=1e-6)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                jax.tree_util.tree_flatten_with_path(g_new)[0]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(path))

    def test_chunked_renderer_matches_single_block(self):
        params = make_params(SMALL)
        ro, rd, lat = make_ray_batch(n=37)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0,
                            perturb=0.0)
        render_chunked = make_ray_renderer(SMALL, rs, chunk=16, jit=False)
        out_c = render_chunked(params, ro, rd, lat, None)
        out_f = render_rays(params, SMALL, rs, ro, rd, lat)
        np.testing.assert_allclose(np.asarray(out_c["rgb_map"]),
                                   np.asarray(out_f["rgb_map"]), atol=1e-5)
        assert out_c["rgb_map"].shape == (37, 3)


class TestLosses:
    def _render(self, cfg, params, n=8, step=1000):
        ro, rd, lat = make_ray_batch(n=n)
        rs = RenderSettings(N_samples=8, N_importance=8, near=1.0, far=4.0)
        out = render_rays(params, cfg, rs, ro, rd, lat,
                          key=jax.random.PRNGKey(1), detailed=True)
        return out, lat

    def test_schedule_endpoints(self):
        np.testing.assert_allclose(float(loss_schedule_factor(0, 100)), 0.01)
        np.testing.assert_allclose(float(loss_schedule_factor(100, 100)), 1.0)

    def test_per_ray_losses_shapes_and_finite(self):
        tc = TrainConfig(offsets_loss_weight=60.0, divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        params = make_params(SMALL, randomize_bender=True)
        out, lat = self._render(SMALL, params)
        target = jnp.zeros((8, 3))
        loss, aux = per_ray_losses(jax.random.PRNGKey(2), params, SMALL, tc,
                                   out, target, lat, step=50)
        assert loss.shape == (8,)
        assert set(aux) == {"img_loss", "img_loss0", "offsets_loss",
                            "divergence_loss"}
        assert np.isfinite(np.asarray(loss)).all()

    def test_losses_finite_at_init(self):
        # zero-init offsets: ||0||^(2-r) must have finite value AND gradient
        tc = TrainConfig(offsets_loss_weight=60.0, divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        params = make_params(SMALL, randomize_bender=False)

        def total(p):
            out, lat = self._render(SMALL, p)
            loss, _ = per_ray_losses(jax.random.PRNGKey(2), p, SMALL, tc,
                                     out, jnp.zeros((8, 3)), lat, step=0)
            return jnp.mean(loss)

        val, grads = jax.value_and_grad(total)(params)
        assert np.isfinite(float(val))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_offsets_loss_without_rigidity_network(self):
        """With use_rigidity_network=False the offsets loss degrades to the
        plain weighted L1 (the reference's commented-out variant,
        train.py:232-234) instead of crashing on the missing mask."""
        import dataclasses
        cfg = dataclasses.replace(SMALL, use_rigidity_network=False)
        tc = TrainConfig(offsets_loss_weight=60.0, divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        params = make_params(cfg, randomize_bender=True)
        out, lat = self._render(cfg, params)
        assert "rigidity_mask" not in out
        loss, aux = per_ray_losses(jax.random.PRNGKey(2), params, cfg, tc,
                                   out, jnp.zeros((8, 3)), lat, step=50)
        assert np.isfinite(np.asarray(loss)).all()
        from nonrigid_nerf_tpu.ops.math import safe_norm
        expected = jnp.mean(
            out["visibility_weights"]
            * safe_norm(out["unmasked_offsets"], axis=-1), axis=-1)
        np.testing.assert_allclose(np.asarray(aux["offsets_loss"]),
                                   np.asarray(expected), rtol=1e-6)

    def test_divergence_exact_matches_jacfwd(self):
        params = make_params(SMALL, randomize_bender=True)
        out, lat = self._render(SMALL, params)
        div_exact = divergence_loss(None, params, SMALL, out, lat, exact=True)

        # brute-force: full jacobian trace at each point
        from nonrigid_nerf_tpu.models.bending import bend_points
        pts = np.asarray(out["initial_input_pts"])  # (R, S, 3)
        R, S = pts.shape[:2]
        lat_pp = np.broadcast_to(np.asarray(lat)[:, None], (R, S, 32))

        def offsets_single(p, l):
            _, d = bend_points(params["bender"], p, l)
            return d["masked_offsets"]

        jac = jax.vmap(jax.vmap(jax.jacfwd(offsets_single), (0, 0)), (0, 0))(
            jnp.asarray(pts), jnp.asarray(lat_pp))
        trace = np.trace(np.asarray(jac), axis1=-2, axis2=-1)
        alpha = np.asarray(out["opacity_alpha"])
        w = 1.0 - np.exp(-np.maximum(alpha, 0.0))
        expected = np.mean(w * trace ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(div_exact), expected, rtol=1e-4)

    def test_divergence_hutchinson_matches_expectation(self):
        params = make_params(SMALL, randomize_bender=True)
        out, lat = self._render(SMALL, params)

        # analytic expectation for gaussian probes:
        # E[(e^T J e)^2] = tr(J)^2 + ||J||_F^2 + tr(J^2)
        from nonrigid_nerf_tpu.models.bending import bend_points
        pts = np.asarray(out["initial_input_pts"])  # (R, S, 3)
        R, S = pts.shape[:2]
        lat_pp = np.broadcast_to(np.asarray(lat)[:, None], (R, S, 32))

        def offsets_single(p, l):
            _, d = bend_points(params["bender"], p, l)
            return d["masked_offsets"]

        jac = np.asarray(
            jax.vmap(jax.vmap(jax.jacfwd(offsets_single), (0, 0)), (0, 0))(
                jnp.asarray(pts), jnp.asarray(lat_pp)))
        tr = np.trace(jac, axis1=-2, axis2=-1)
        fro2 = np.sum(jac ** 2, axis=(-2, -1))
        tr_j2 = np.trace(jac @ jac, axis1=-2, axis2=-1)
        alpha = np.asarray(out["opacity_alpha"])
        w = 1.0 - np.exp(-np.maximum(alpha, 0.0))
        expected = np.mean(w * (tr ** 2 + fro2 + tr_j2), axis=-1)   # (R,)

        ests = np.stack([
            np.asarray(divergence_loss(jax.random.PRNGKey(i), params, SMALL,
                                       out, lat))
            for i in range(300)])
        mean_est = ests.mean(0)
        np.testing.assert_allclose(mean_est, expected, rtol=0.35)
