"""Train step + checkpoint tests, including a mini end-to-end training run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.checkpoints import (
    save_checkpoint, load_checkpoint, restore_opt_state, latest_checkpoint)
from nonrigid_nerf_tpu.data import (
    load_llff_data, get_multi_view_mappings, get_intrinsics,
    block_train_test_split, build_ray_dataset)
from nonrigid_nerf_tpu.engine.train_state import (
    TrainState, create_train_state, lr_schedule, make_optimizer)
from nonrigid_nerf_tpu.engine.train_step import make_train_step
from tests.test_data import write_synthetic_sequence


TINY = ModelConfig(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                   skips=(), multires=4, N_samples=8, N_importance=8,
                   bending_depth=3, bending_width=16, rigidity_depth=2,
                   rigidity_width=8, ray_bending_latent_size=4)


def build_tiny_dataset(tmp_path, train_block=0, test_block=0):
    n, H, W, focal = write_synthetic_sequence(str(tmp_path), n=4, H=10, W=12)
    images, poses, bds, _, _ = load_llff_data(str(tmp_path), factor=1)
    extras = get_multi_view_mappings(n, str(tmp_path))
    intrin = get_intrinsics(str(tmp_path), extras, images, poses[0, :, 4],
                            ray_bending_latent_size=4)
    i_train, i_test = block_train_test_split(
        n, extras["imageid_to_timestepid"], train_block, test_block)
    ds = build_ray_dataset(images, poses[:, :3, :4], intrin, extras,
                           i_train, i_test, near=2.0, far=6.0)
    return ds


class TestLrSchedule:
    def test_matches_reference_formula(self):
        tc = TrainConfig(lrate=5e-4, lrate_decay=250000, warmup_steps=1000)
        sched = lr_schedule(tc)
        # the reference updates the LR AFTER optimizer.step()
        # (train.py:1631-1643), so optimizer step k runs at the value
        # computed for k-1 — and step 0 runs at the raw lrate, never
        # seeing the warmup divisor
        np.testing.assert_allclose(float(sched(0)), 5e-4, rtol=1e-6)
        # step 1 uses the value computed after step 0: lr / (20 * 1 + 1)
        np.testing.assert_allclose(float(sched(1)), 5e-4 / 21.0, rtol=1e-6)
        # one past warmup end: full lr (* tiny decay at g = 1000)
        expected = 5e-4 * 0.1 ** (1000 / 250000)
        np.testing.assert_allclose(float(sched(1001)), expected, rtol=1e-6)
        # deep decay (off-by-one is negligible here)
        np.testing.assert_allclose(float(sched(250000)), 5e-5, rtol=1e-4)

    def test_matches_reference_loop_over_full_warmup(self):
        """Literal transcription of the reference's post-step LR loop
        (train.py:1631-1643): lr starts at args.lrate and is recomputed
        AFTER optimizer.step() from the pre-increment global_step. Pin
        our schedule to it across the whole warmup and past it."""
        lrate, decay, warm = 5e-4, 250000, 1000
        tc = TrainConfig(lrate=lrate, lrate_decay=decay, warmup_steps=warm)
        sched = lr_schedule(tc)
        ref_lr = lrate   # what the reference's step 0 runs at
        for global_step in range(2500):
            np.testing.assert_allclose(
                float(sched(global_step)), ref_lr, rtol=1e-6,
                err_msg=f"step {global_step}")
            new_lrate = lrate * (0.1 ** (global_step / decay))
            if global_step < warm:
                new_lrate /= 20.0 * (-(global_step - warm) / warm) + 1.0
            ref_lr = new_lrate


class TestTrainStep:
    def test_single_step_updates_params(self, tmp_path):
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=32, offsets_loss_weight=60.0,
                         divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            raw_noise_std=1.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=False,
                                  donate=False)
        old_w = np.asarray(state.params["coarse"]["pts"][0]["w"]).copy()
        new_state, metrics = step_fn(state, ds, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        assert not np.array_equal(
            np.asarray(new_state.params["coarse"]["pts"][0]["w"]), old_w)
        # at step 1 the zero-init bending output layer blocks latent
        # gradients (matching the reference); after it moves, latents follow
        assert float(jnp.abs(new_state.params["latents"]).max()) == 0.0
        for _ in range(2):
            new_state, _ = step_fn(new_state, ds, jax.random.PRNGKey(2))
        assert float(jnp.abs(new_state.params["latents"]).max()) > 0.0

    def test_debug_metrics_grad_norm(self, tmp_path):
        """--debug adds a per-step global gradient-norm audit (reference
        analog: train.py:1617-1629)."""
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=32, offsets_loss_weight=60.0, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=False,
                                  donate=False, debug_metrics=True)
        _, metrics = step_fn(state, ds, jax.random.PRNGKey(1))
        assert "grad_norm" in metrics
        assert np.isfinite(float(metrics["grad_norm"]))
        assert float(metrics["grad_norm"]) > 0

    def test_loss_decreases_e2e(self, tmp_path):
        """The ONE-model milestone: a few hundred steps on a synthetic scene
        must reduce reconstruction loss (SURVEY.md §7 step 3)."""
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=128, lrate=5e-3, lrate_decay=250000,
                         offsets_loss_weight=60.0, divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=300,
                         warmup_steps=10)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=False)
        key = jax.random.PRNGKey(42)
        first = None
        for i in range(200):
            state, metrics = step_fn(state, ds, key)
            if i == 0:
                first = float(metrics["img_loss"])
        last = float(metrics["img_loss"])
        assert np.isfinite(last)
        assert last < first * 0.7, (first, last)

    def test_test_split_only_updates_latents_for_test_rays(self, tmp_path):
        ds = build_tiny_dataset(tmp_path, train_block=1, test_block=1)
        # timesteps 0,2 train; 1,3 test
        assert float(ds.test_indicator.sum()) == 2.0
        tc = TrainConfig(N_rand=64, offsets_loss_weight=60.0,
                         divergence_loss_weight=0.0, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        # un-zero the bending output layer so latents receive gradients
        state.params["bender"]["bend"][-1]["w"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(9), state.params["bender"]["bend"][-1]["w"].shape)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=True,
                                  donate=False)
        new_state, _ = step_fn(state, ds, jax.random.PRNGKey(3))
        # all-timestep latents may move (train rays through bending + test
        # rays through phase 2); network weights must also move
        assert float(jnp.abs(new_state.params["latents"]).max()) > 0.0

        # gradient isolation check: a batch of ONLY test rays must leave the
        # networks untouched. Force it by zeroing the train indicator.
        import dataclasses
        ds_test_only = dataclasses.replace(
            ds, train_indicator=jnp.zeros_like(ds.train_indicator),
            test_indicator=jnp.ones_like(ds.test_indicator))
        new_state2, _ = step_fn(state, ds_test_only, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(
            np.asarray(new_state2.params["coarse"]["pts"][0]["w"]),
            np.asarray(state.params["coarse"]["pts"][0]["w"]))
        assert float(jnp.abs(
            new_state2.params["latents"] - state.params["latents"]).max()) > 0


class TestPrefetchTraining:
    def test_bitwise_identical_to_fused(self, tmp_path):
        """Presampled training (make_prefetch_train_step) reproduces fused
        training: same fold_in(key, step)-derived sampling keys, same
        render/loss keys, so 6 steps (crossing a prefetch window boundary
        at n_prefetch=4) sample identical pixels and end within float
        roundoff (the restructured program reorders a few reductions;
        measured divergence ~1e-8 abs / ~1e-7 rel)."""
        from nonrigid_nerf_tpu.engine.train_step import \
            make_prefetch_train_step
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=32, offsets_loss_weight=60.0,
                         divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            raw_noise_std=1.0)
        key = jax.random.PRNGKey(7)
        n_steps, n_pref = 6, 4

        state_f = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                     ds.num_timesteps)
        fused = make_train_step(TINY, tc, rs, has_test_split=False,
                                donate=False)
        for _ in range(n_steps):
            state_f, m_f = fused(state_f, ds, key)

        state_p = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                     ds.num_timesteps)
        presample, step = make_prefetch_train_step(
            TINY, tc, rs, has_test_split=False, n_prefetch=n_pref,
            donate=False)
        batches, base = None, -1
        for s in range(n_steps):
            if batches is None or not base <= s < base + n_pref:
                base = s
                batches = presample(ds, key, np.int32(s))
            state_p, m_p = step(state_p, batches, np.int32(s - base), key)

        assert int(state_p.step) == int(state_f.step) == n_steps
        np.testing.assert_allclose(np.asarray(m_p["loss"]),
                                   np.asarray(m_f["loss"]),
                                   rtol=1e-6, atol=1e-9)
        leaves_f = jax.tree_util.tree_leaves(state_f.params)
        leaves_p = jax.tree_util.tree_leaves(state_p.params)
        for lf, lp in zip(leaves_f, leaves_p):
            np.testing.assert_allclose(np.asarray(lf), np.asarray(lp),
                                       rtol=1e-5, atol=1e-6)


class TestCheckpoints:
    def test_roundtrip(self, tmp_path):
        tc = TrainConfig()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc, 4)
        extras = {"near": 2.0, "far": 6.0, "intrinsics": {"0": {"focal_x": 20.0}}}
        path = os.path.join(tmp_path, "latest.npz")
        save_checkpoint(path, 123, state.params, state.opt_state, extras)

        step, params, opt_state, loaded_extras = load_checkpoint(path)
        assert step == 123
        assert loaded_extras["near"] == 2.0
        for (p1, p2) in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

        restored = restore_opt_state(state.opt_state, opt_state)
        for (p1, p2) in zip(jax.tree_util.tree_leaves(state.opt_state),
                            jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_resume_training(self, tmp_path):
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=32, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0)
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc,
                                   ds.num_timesteps)
        step_fn = make_train_step(TINY, tc, rs, has_test_split=False,
                                  donate=False)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            state, _ = step_fn(state, ds, key)

        path = os.path.join(tmp_path, "logs", "latest.npz")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_checkpoint(path, int(state.step), state.params, state.opt_state)

        found = latest_checkpoint(os.path.join(tmp_path, "logs"))
        assert found == path
        step, params, opt_tree, _ = load_checkpoint(found)
        opt_state = restore_opt_state(state.opt_state, opt_tree)
        resumed = TrainState(params=params, opt_state=opt_state,
                             step=jnp.asarray(step, jnp.int32))
        # continues identically to the uninterrupted run
        cont1, m1 = step_fn(state, ds, key)
        cont2, m2 = step_fn(resumed, ds, key)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)

    def test_orbax_roundtrip_bit_identical_with_npz(self, tmp_path):
        """The opt-in Orbax/TensorStore backend shares the flatten layer
        with the npz format, so the two must restore identically."""
        pytest.importorskip("orbax.checkpoint")
        tc = TrainConfig()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc, 4)
        extras = {"near": 2.0, "intrinsics": {"0": {"focal_x": 20.0}}}
        p_npz = os.path.join(tmp_path, "latest.npz")
        p_orb = os.path.join(tmp_path, "latest.orbax")
        save_checkpoint(p_npz, 123, state.params, state.opt_state, extras)
        save_checkpoint(p_orb, 123, state.params, state.opt_state, extras)
        assert os.path.isdir(p_orb)

        got_n = load_checkpoint(p_npz)
        got_o = load_checkpoint(p_orb)
        assert got_o[0] == got_n[0] == 123
        assert got_o[3] == got_n[3]
        for which in (1, 2):  # params tree, opt_state tree
            leaves_n = jax.tree_util.tree_leaves(got_n[which])
            leaves_o = jax.tree_util.tree_leaves(got_o[which])
            assert len(leaves_n) == len(leaves_o)
            for a, b in zip(leaves_n, leaves_o):
                assert np.asarray(a).dtype == np.asarray(b).dtype
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restore_opt_state works off the orbax tree too
        restored = restore_opt_state(state.opt_state, got_o[2])
        for p1, p2 in zip(jax.tree_util.tree_leaves(state.opt_state),
                          jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_orbax_overwrite_and_scan(self, tmp_path):
        """latest.orbax is rewritten in place (directory swap) and the
        auto-resume scan treats both formats uniformly."""
        pytest.importorskip("orbax.checkpoint")
        tc = TrainConfig()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc, 4)
        logdir = str(tmp_path)
        latest = os.path.join(logdir, "latest.orbax")
        save_checkpoint(latest, 100, state.params)
        save_checkpoint(latest, 200, state.params)   # overwrite dance
        assert load_checkpoint(latest)[0] == 200
        assert not os.path.exists(latest + ".tmp")
        assert not os.path.exists(latest + ".old")
        save_checkpoint(os.path.join(logdir, "050000.orbax"), 50000,
                        state.params)
        found = latest_checkpoint(logdir)
        assert found == latest

    def test_numbered_vs_latest(self, tmp_path):
        tc = TrainConfig()
        state = create_train_state(jax.random.PRNGKey(0), TINY, tc, 4)
        logdir = str(tmp_path)
        save_checkpoint(os.path.join(logdir, "050000.npz"), 50000,
                        state.params)
        save_checkpoint(os.path.join(logdir, "latest.npz"), 51000,
                        state.params)
        assert latest_checkpoint(logdir).endswith("latest.npz")


class TestViewdirsTraining:
    @pytest.mark.parametrize("approx", [True, False])
    def test_viewdirs_training_stays_finite(self, tmp_path, approx):
        """Regression: the fine pass sorts coarse+importance depths, which
        produces near-duplicate samples; the finite-difference viewdirs must
        not emit NaN gradients through zero-length differences."""
        import dataclasses
        cfg = dataclasses.replace(TINY, use_viewdirs=True,
                                  approx_nonrigid_viewdirs=approx,
                                  multires_views=2)
        ds = build_tiny_dataset(tmp_path)
        tc = TrainConfig(N_rand=64, offsets_loss_weight=60.0,
                         divergence_loss_weight=3.0,
                         rigidity_loss_weight=5e-4, N_iters=100)
        rs = RenderSettings(N_samples=8, N_importance=8, near=2.0, far=6.0,
                            raw_noise_std=1.0)
        state = create_train_state(jax.random.PRNGKey(0), cfg, tc,
                                   ds.num_timesteps)
        # nonzero bending so the viewdirs actually depend on the bender
        state.params["bender"]["bend"][-1]["w"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(7), state.params["bender"]["bend"][-1]["w"].shape)
        step_fn = make_train_step(cfg, tc, rs, has_test_split=False,
                                  donate=False)
        for i in range(5):
            state, metrics = step_fn(state, ds, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert np.isfinite(np.asarray(leaf)).all()
