"""Reference-checkpoint interop tests (nonrigid_nerf_tpu/interop.py).

Three rings of evidence:
  1. self round-trip: our params -> reference-format tar -> our params,
     bit-exact, no torch modules involved beyond tensor containers;
  2. against the real reference modules (requires /root/reference):
     a tar produced by the actual torch NeRF/ray_bending state_dicts and a
     real torch.optim.Adam state imports to exactly the tree the e2e
     parity harness builds, and our exported tar load_state_dict()s
     strict=True into the reference's modules and optimizer;
  3. resume parity: two reference Adam steps -> tar -> import (weights +
     moments) -> ONE production jitted step matches the reference's third
     step, parameter delta by parameter delta, in f64 — the "continue
     training from a reference checkpoint" claim, measured.
Plus the CLI driver end-to-end (import -> train.py resumes -> FVR loads).
"""

import dataclasses
import functools
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, requires_reference

torch = pytest.importorskip("torch")

from nonrigid_nerf_tpu import interop  # noqa: E402


def _tiny_cfg(**kw):
    from nonrigid_nerf_tpu.config import ModelConfig
    defaults = dict(netdepth=4, netwidth=32, netdepth_fine=4, netwidth_fine=32,
                    N_samples=8, N_importance=8, skips=[2],
                    ray_bending_latent_size=8)
    defaults.update(kw)
    return ModelConfig(**defaults)


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a)} vs {set(b)}"
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


class TestSelfRoundTrip:
    @pytest.mark.parametrize("viewdirs,bender", [(False, True), (True, True),
                                                 (False, False)])
    def test_params_round_trip_bitexact(self, tmp_path, viewdirs, bender):
        import jax
        from nonrigid_nerf_tpu.engine.train_state import init_params
        cfg = _tiny_cfg(use_viewdirs=viewdirs,
                        ray_bending=("simple_neural" if bender else None))
        params = init_params(jax.random.PRNGKey(0), cfg, num_timesteps=3)
        # zero-init latents carry no information; randomize to catch swaps
        params["latents"] = jax.random.normal(
            jax.random.PRNGKey(1), params["latents"].shape)

        tar = tmp_path / "latest.tar"
        interop.export_reference_tar(str(tar), params, step=7)
        got, info = interop.params_from_reference_tar(
            interop.load_reference_tar(str(tar)))
        assert info["global_step"] == 7
        assert info["use_viewdirs"] == viewdirs
        assert info["has_bender"] == bender
        assert info["skips"] == [2]
        _assert_tree_equal(got, params)

    def test_opt_state_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from nonrigid_nerf_tpu.config import TrainConfig
        from nonrigid_nerf_tpu.engine.train_state import (init_params,
                                                          make_optimizer)
        cfg = _tiny_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg, num_timesteps=3)
        optimizer = make_optimizer(TrainConfig())
        opt_state = optimizer.init(params)
        # fabricate distinctive moments so a transpose/oredering bug shows
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        rng = np.random.RandomState(0)
        filled = []
        for leaf in leaves:
            arr = np.asarray(leaf)
            filled.append(jnp.asarray(rng.rand(*arr.shape), arr.dtype)
                          if arr.ndim else leaf)
        opt_state = jax.tree_util.tree_unflatten(treedef, filled)

        tar = tmp_path / "latest.tar"
        interop.export_reference_tar(str(tar), params, step=5,
                                     opt_state=opt_state)
        ckpt = interop.load_reference_tar(str(tar))
        got_params, info = interop.params_from_reference_tar(ckpt)
        got_state = interop.opt_state_from_reference_tar(
            ckpt, got_params, info, optimizer)
        assert int(got_state[0].count) == 5
        _assert_tree_equal(got_state[0].mu, opt_state[0].mu)
        _assert_tree_equal(got_state[0].nu, opt_state[0].nu)


# ---------------------------------------------------------------------------
# against the real reference modules


@requires_reference
class TestAgainstReferenceModules:
    @pytest.fixture(scope="class")
    def ref_setup(self, tmp_path_factory):
        from tests.test_reference_e2e import (build_reference,
                                              load_ref_train_module,
                                              make_ref_args)
        ref_train = load_ref_train_module()
        args = make_ref_args(tmp_path_factory.mktemp("interop_ref"))
        rk_train, latents, start = build_reference(ref_train, args)
        return ref_train, args, rk_train, latents

    def _reference_tar_dict(self, rk_train, latents, optimizer=None,
                            global_step=0):
        """Assemble the exact torch.save payload of reference
        train.py:1680-1698."""
        all_latents = torch.stack([l.detach() for l in latents])
        return {
            "global_step": global_step,
            "network_fn_state_dict": rk_train["network_fn"].state_dict(),
            "network_fine_state_dict":
                rk_train["network_fine"].state_dict(),
            "ray_bender_state_dict": rk_train["ray_bender"].state_dict(),
            "optimizer_state_dict":
                (None if optimizer is None else optimizer.state_dict()),
            "ray_bending_latent_codes": all_latents,
            "intrinsics": {0: {"height": 8, "width": 9, "focal_x": 10.0,
                               "focal_y": 10.0, "center_x": 4.5,
                               "center_y": 4.0}},
            "scripts_dict": {"near": 2.0, "far": 6.0,
                             "image_folder": "images"},
            "dataset_extras": {"is_multiview": False,
                               "imageid_to_timestepid": [0, 1, 2, 3]},
        }

    def test_import_matches_parity_harness_mapping(self, ref_setup):
        """interop's state-dict mapping == the mapping the e2e gradient
        parity tests are built on (params_from_reference)."""
        from tests.test_reference_e2e import params_from_reference
        _, _, rk_train, latents = ref_setup
        ckpt = self._reference_tar_dict(rk_train, latents)
        got, info = interop.params_from_reference_tar(ckpt)
        want = params_from_reference(rk_train, latents)
        assert info["netdepth"] == 8 and info["netwidth"] == 256
        assert info["skips"] == [4]
        assert info["multires"] == 10
        _assert_tree_equal(got, want)

    def test_adam_moments_transfer(self, ref_setup):
        """Real torch Adam state (populated by real backward steps) lands
        on the right leaves, transposed where weights transpose."""
        ref_train, args, rk_train, latents = ref_setup
        grad_vars = (list(latents)
                     + list(rk_train["ray_bender"].parameters())
                     + list(rk_train["network_fn"].parameters())
                     + list(rk_train["network_fine"].parameters()))
        optimizer = torch.optim.Adam(grad_vars, lr=1e-3, betas=(0.9, 0.999))
        for _ in range(2):
            optimizer.zero_grad()
            loss = sum((p * p).sum() for p in grad_vars)
            loss.backward()
            optimizer.step()

        ckpt = self._reference_tar_dict(rk_train, latents, optimizer,
                                        global_step=2)
        params, info = interop.params_from_reference_tar(ckpt)
        from nonrigid_nerf_tpu.config import TrainConfig
        from nonrigid_nerf_tpu.engine.train_state import make_optimizer
        opt_state = interop.opt_state_from_reference_tar(
            ckpt, params, info, make_optimizer(TrainConfig()))
        adam = opt_state[0]
        assert int(adam.count) == 2

        st = optimizer.state_dict()["state"]
        slots = interop.reference_optimizer_slots(params, info)
        checked = 0
        for idx, path in enumerate(slots):
            if path is None or idx not in st:
                continue
            m = st[idx]["exp_avg"].numpy()
            if path[0] == "latents":
                got = np.asarray(adam.mu["latents"][path[1]])
            else:
                got = np.asarray(interop._get_leaf(adam.mu, path))
                if path[-1] == "w":
                    m = m.T
            np.testing.assert_allclose(got, m, rtol=1e-6)
            checked += 1
        assert checked == len([s for s in slots if s is not None])

    def test_export_loads_into_reference_strict(self, ref_setup, tmp_path):
        """Our tar loads into the actual reference modules with
        load_state_dict(strict=True) + optimizer.load_state_dict, and the
        weights that come out equal the weights that went in."""
        from tests.test_reference_e2e import params_from_reference
        _, _, rk_train, latents = ref_setup
        params = params_from_reference(rk_train, latents)
        import jax
        params = jax.tree_util.tree_map(
            lambda x: np.array(x, copy=True), params)

        tar = tmp_path / "exported.tar"
        out = interop.export_reference_tar(str(tar), params, step=3)
        loaded = torch.load(str(tar), map_location="cpu",
                            weights_only=False)
        rk_train["network_fn"].load_state_dict(
            loaded["network_fn_state_dict"], strict=True)
        rk_train["network_fine"].load_state_dict(
            loaded["network_fine_state_dict"], strict=True)
        rk_train["ray_bender"].load_state_dict(
            loaded["ray_bender_state_dict"], strict=True)
        grad_vars = (list(latents)
                     + list(rk_train["ray_bender"].parameters())
                     + list(rk_train["network_fn"].parameters())
                     + list(rk_train["network_fine"].parameters()))
        optimizer = torch.optim.Adam(grad_vars, lr=1e-3)
        optimizer.load_state_dict(loaded["optimizer_state_dict"])
        # round trip: reference modules -> (export) -> reference modules
        _assert_tree_equal(params_from_reference(rk_train, latents), params)
        assert out["scripts_dict"] == {}


@requires_reference
class TestResumeFromReferenceMidTraining:
    """Two reference Adam steps -> tar -> import -> our third step equals
    the reference's third step (f64, per-leaf parameter deltas). This is
    the 'continue a half-trained reference experiment here' claim."""

    def test_third_step_matches(self, tmp_path, monkeypatch):
        from tests.test_reference_e2e import (
            LATENT, R, T, jax_configs, load_ref_train_module, make_batch,
            make_ref_args, torch_default_dtype)

        ref_train = load_ref_train_module()

        with torch_default_dtype(torch.float64):
            args = make_ref_args(tmp_path / "resume")
            torch.manual_seed(0)
            latents = [(0.1 * torch.randn(LATENT)).clone().requires_grad_()
                       for _ in range(T)]
            (rk_train, _, start, grad_vars, optimizer) = \
                ref_train.create_nerf(args, latents, ignore_optimizer=False)
            rk_train.update({"near": 2.0, "far": 6.0})
            bender = rk_train["ray_bender"]
            with torch.no_grad():
                bender.network[-1].weight.normal_(0, 0.05)
                bender.rigidity_network[-1].weight.normal_(0, 0.5)
                bender.rigidity_network[-1].bias.normal_(0, 0.5)

            import run_nerf_helpers as ref_helpers
            monkeypatch.setattr(ref_helpers, "divergence_approx",
                                ref_helpers.divergence_exact)

            rays_o, rays_d, target, image_ids = make_batch()
            pix = torch.tensor(
                np.stack([image_ids, np.zeros(R), np.zeros(R)], -1),
                dtype=torch.long)
            wrapper = ref_train.training_wrapper_class(
                rk_train["network_fn"], latents,
                fine_model=rk_train["network_fine"], ray_bender=bender)
            train_ind = torch.tensor(
                1.0 - (image_ids == T - 1).astype(np.float64))
            test_ind = 1.0 - train_ind

            def ref_one_step(global_step):
                optimizer.zero_grad()
                for latent in latents:
                    latent.grad = None
                losses = wrapper(
                    args, torch.tensor(rays_o, dtype=torch.float64),
                    torch.tensor(rays_d, dtype=torch.float64), 100,
                    rk_train, torch.tensor(target, dtype=torch.float64),
                    global_step, start,
                    {"imageid_to_timestepid": list(range(T))}, pix)
                (test_ind * losses).mean().backward(retain_graph=True)
                for w in (list(rk_train["network_fn"].parameters())
                          + list(rk_train["network_fine"].parameters())
                          + list(bender.parameters())):
                    w.grad = None
                (train_ind * losses).mean().backward()
                optimizer.step()
                # the reference's post-step LR update (train.py:1631-1643)
                new_lrate = args.lrate * (
                    0.1 ** (global_step / args.lrate_decay))
                if global_step < 1000:
                    new_lrate /= (20.0 * (-(global_step - 1000) / 1000)
                                  + 1.0)
                for group in optimizer.param_groups:
                    group["lr"] = new_lrate

            ref_one_step(0)
            ref_one_step(1)

            # ---- the reference's checkpoint after two steps
            tar = tmp_path / "000002.tar"
            torch.save({
                "global_step": 2,
                "network_fn_state_dict":
                    rk_train["network_fn"].state_dict(),
                "network_fine_state_dict":
                    rk_train["network_fine"].state_dict(),
                "ray_bender_state_dict": bender.state_dict(),
                "optimizer_state_dict": optimizer.state_dict(),
                "ray_bending_latent_codes":
                    torch.stack([l.detach() for l in latents]),
                "intrinsics": {}, "scripts_dict": {}, "dataset_extras": {},
            }, str(tar))

        # ---- import (f64) and take our third step with the production step
        import jax
        with jax.enable_x64():
            import jax.numpy as jnp
            from nonrigid_nerf_tpu.engine import train_step as ts_mod
            from nonrigid_nerf_tpu.engine.train_state import (TrainState,
                                                              make_optimizer)
            from nonrigid_nerf_tpu.engine import losses as losses_mod

            ckpt = interop.load_reference_tar(str(tar))
            params, info = interop.params_from_reference_tar(ckpt)
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)
            assert info["global_step"] == 2

            cfg, rs, tc = jax_configs()
            cfg = dataclasses.replace(cfg, compute_dtype="float64")
            tc = dataclasses.replace(tc, lrate=5e-4, lrate_decay=250000)
            optimizer_j = make_optimizer(tc)
            opt_state = interop.opt_state_from_reference_tar(
                ckpt, params, info, optimizer_j)
            opt_state = jax.tree_util.tree_map(
                lambda x: (jnp.asarray(np.asarray(x), jnp.float64)
                           if np.asarray(x).dtype == np.float32 else x),
                opt_state)

            monkeypatch.setattr(
                losses_mod, "divergence_loss",
                functools.partial(losses_mod.divergence_loss, exact=True))

            test_np = (image_ids == T - 1).astype(np.float64)
            batch = {
                "rays_o": jnp.asarray(rays_o, jnp.float64),
                "rays_d": jnp.asarray(rays_d, jnp.float64),
                "target_rgb": jnp.asarray(target, jnp.float64),
                "image_ids": jnp.asarray(image_ids),
                "timestep_ids": jnp.asarray(image_ids),
                "train_indicator": jnp.asarray(1.0 - test_np),
                "test_indicator": jnp.asarray(test_np),
            }
            monkeypatch.setattr(ts_mod, "sample_ray_batch",
                                lambda key, ds, n_rand: batch)
            params0 = jax.tree_util.tree_map(
                lambda x: np.array(x, copy=True), params)
            state = TrainState(params=params, opt_state=opt_state,
                               step=jnp.asarray(2, jnp.int32))
            step_fn = jax.jit(functools.partial(
                ts_mod.train_step, cfg=cfg, tc=tc, rs=rs,
                optimizer=optimizer_j, has_test_split=True, n_rand=R))
            state, _ = step_fn(state, None, jax.random.PRNGKey(7))

        # ---- reference's third step
        with torch_default_dtype(torch.float64):
            ref_one_step(2)
        from tests.test_reference_e2e import params_from_reference
        with jax.enable_x64():
            ref_params = jax.tree_util.tree_map(
                lambda x: np.array(x, copy=True),
                params_from_reference(rk_train, latents))

        for (path, a0), (_, a1), (_, b1) in zip(
                jax.tree_util.tree_flatten_with_path(params0)[0],
                jax.tree_util.tree_flatten_with_path(state.params)[0],
                jax.tree_util.tree_flatten_with_path(ref_params)[0]):
            da = np.asarray(a1) - np.asarray(a0)
            db = np.asarray(b1) - np.asarray(a0)
            diff = np.linalg.norm(da - db)
            ref = np.linalg.norm(db)
            # looser than the 3-step trajectory test (5e-4): only ONE
            # warmup-scaled (~lr/21) step is compared, so the documented
            # sign-like-Adam noise amplification on noise-floor gradient
            # components is not diluted by the large raw-lr first step
            # (measured worst leaf ~7e-4 normwise, fine.pts[0].b)
            assert diff <= 2e-3 * ref + 1e-12, (
                f"{jax.tree_util.keystr(path)}: |d_ours-d_ref|={diff:.3e} "
                f"|d_ref|={ref:.3e}")


# ---------------------------------------------------------------------------
# CLI end-to-end (no reference modules needed: the tar comes from export)


class TestImportCLI:
    def test_import_then_resume_and_render(self, tmp_path):
        import jax
        from nonrigid_nerf_tpu.config import TrainConfig
        from nonrigid_nerf_tpu.engine.train_state import (init_params,
                                                          make_optimizer)
        from tests.test_data import write_synthetic_sequence

        datadir = tmp_path / "data"
        datadir.mkdir()
        n, H, W, _ = write_synthetic_sequence(str(datadir), n=4, H=10, W=12)

        # a "reference" experiment dir: args.txt in the reference's format
        # (including reference-only flags that must be dropped) + a tar
        ref_exp = tmp_path / "ref_exp" / "logs"
        ref_exp.mkdir(parents=True)
        # skips stays at the default (4,) — with netdepth=4 no skip fires,
        # matching what train.py will rebuild from the converted args
        cfg = _tiny_cfg(skips=(4,))
        params = init_params(jax.random.PRNGKey(3), cfg, num_timesteps=n)
        # at width 32 a random init can start ReLU-dead in BOTH sigma heads
        # (all sampled raw sigmas negative -> black renders -> exactly zero
        # gradients everywhere); push the output biases up so the imported
        # model starts alive and the resumed steps measurably move weights
        for net in ("coarse", "fine"):
            b = np.asarray(params[net]["output"]["b"]).copy()
            b += 1.0
            params[net]["output"]["b"] = b
        optimizer = make_optimizer(TrainConfig())
        args_lines = {
            "datadir": str(datadir), "netdepth": 4, "netwidth": 32,
            "netdepth_fine": 4, "netwidth_fine": 32, "N_samples": 8,
            "N_importance": 8, "N_rand": 32, "chunk": 512, "netchunk": 512,
            "ray_bending": "simple_neural", "ray_bending_latent_size": 8,
            "use_viewdirs": "False", "multires": 10,
            "factor": 1, "no_batching": "True",   # reference-only flag
            "random_seed": 0,                     # reference-only flag
            # real runs carry the flags of their ORIGINAL launch; the
            # importer must neutralize these or the imported experiment
            # would silently train from scratch instead of resuming
            "no_reload": "True",
        }
        with open(ref_exp / "args.txt", "w") as f:
            for k in sorted(args_lines):
                f.write(f"{k} = {args_lines[k]}\n")
        interop.export_reference_tar(
            str(ref_exp / "000010.tar"), params, step=10,
            opt_state=optimizer.init(params))

        out_exp = tmp_path / "imported_exp"
        env = dict(os.environ, JAX_PLATFORMS="cpu", NRNERF_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "tools/import_reference_checkpoint.py",
             str(tmp_path / "ref_exp"), str(out_exp),
             "--set", "N_iters=13",
             "--set", "i_weights=1", "--set", "i_print=1",
             "--set", "i_img=0", "--set", "i_video=100000",
             "--set", "i_testset=100000", "--set", "seed=0",
             "--set", "expname=imported_exp"],
            cwd=str(REPO_ROOT), env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert "step 10" in r.stdout
        assert (out_exp / "logs" / "latest.npz").exists()

        # the converted args.txt parses as ours and dropped the dead flags
        from nonrigid_nerf_tpu.config import parse_config_file
        conv = parse_config_file(str(out_exp / "logs" / "args.txt"))
        assert "no_batching" not in conv and "random_seed" not in conv
        assert conv["netwidth"] == 32

        # our trainer resumes from the imported checkpoint (step 10 -> 13)
        r = subprocess.run(
            [sys.executable, "train.py",
             "--config", str(out_exp / "logs" / "args.txt")],
            cwd=str(REPO_ROOT), env=env, capture_output=True, text=True,
            timeout=600)
        assert r.returncode == 0, r.stderr[-4000:]
        from nonrigid_nerf_tpu.checkpoints import (latest_checkpoint,
                                                   load_checkpoint)
        step, got_params, opt_tree, _ = load_checkpoint(
            latest_checkpoint(str(out_exp / "logs")))
        assert step == 13
        # training moved the weights from the imported starting point.
        # Compare the GLOBAL delta, not one hand-picked leaf: at this tiny
        # width (32) a random init can start with a ReLU-dead coarse sigma
        # head (all raw sigmas negative over the sampled points), whose
        # gradients are then legitimately zero for the first steps — the
        # fine net and the final bend layer always move.
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a)
                                      - np.asarray(b)).max()),
            got_params, dict(params))
        total = sum(jax.tree_util.tree_leaves(deltas))
        assert total > 0, deltas
        assert max(jax.tree_util.tree_leaves(deltas)) > 1e-7
        assert opt_tree is not None

        # and the imported experiment renders through the FVR app
        import free_viewpoint_rendering as fvr_cli
        fvr_args = fvr_cli.build_parser().parse_args(
            ["--input", str(out_exp), "--deformations", "train",
             "--camera_path", "fixed", "--fixed_view", "0"])
        out_folder = fvr_cli.free_viewpoint_rendering(fvr_args)
        assert "rgb_000000.png" in os.listdir(out_folder)

    def test_export_cli_round_trip(self, tmp_path):
        import jax
        from nonrigid_nerf_tpu.checkpoints import save_checkpoint
        from nonrigid_nerf_tpu.config import Args, TrainConfig
        from nonrigid_nerf_tpu.engine.train_state import (init_params,
                                                          make_optimizer)
        cfg = _tiny_cfg()
        params = init_params(jax.random.PRNGKey(5), cfg, num_timesteps=3)
        optimizer = make_optimizer(TrainConfig())
        exp = tmp_path / "our_exp" / "logs"
        exp.mkdir(parents=True)
        Args(netdepth=4, netwidth=32, netdepth_fine=4, netwidth_fine=32,
             skips=[2], ray_bending_latent_size=8).dump(
            str(exp / "args.txt"))
        save_checkpoint(str(exp / "latest.npz"), 42, params,
                        optimizer.init(params),
                        {"scripts_dict": {"near": 2.0, "far": 6.0}})

        out_tar = tmp_path / "out.tar"
        r = subprocess.run(
            [sys.executable, "tools/export_reference_checkpoint.py",
             str(tmp_path / "our_exp"), str(out_tar)],
            cwd=str(REPO_ROOT),
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ckpt = interop.load_reference_tar(str(out_tar))
        assert ckpt["global_step"] == 42
        got, _ = interop.params_from_reference_tar(ckpt)
        _assert_tree_equal(got, params)
        assert ckpt["scripts_dict"] == {"near": 2.0, "far": 6.0}
