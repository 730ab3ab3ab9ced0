"""One-step END-TO-END training parity against the ACTUAL PyTorch reference.

The component-level parity tests (tests/test_models.py, tests/test_ops.py)
pin each block against the imported reference `run_nerf_helpers`; this file
closes the loop on the full composition: identical weights + identical ray
batch through

  reference: training_wrapper_class.forward (render -> render_rays ->
             run_network -> NeRF/ray_bending -> raw2outputs -> losses,
             reference train.py:152-286, 792-980) + the two-phase backward
             (reference train.py:1594-1608)
  ours:      the production `train_step` (engine/train_step.py) and the
             production render_rays + per_ray_losses composition

and asserts per-ray losses and *every parameter gradient leaf* agree to
fp32 tolerance.

CPU harness notes:
- the reference hard-codes `.cuda()` / `.get_device()`; both are patched to
  CPU no-ops before the module loads (the reference itself falls back to a
  CPU `device` constant when CUDA is absent, run_nerf_helpers.py:7).
- randomness is removed, not seeded: perturb=0 (deterministic stratified
  samples + det sample_pdf on both sides), raw_noise_std=0, and the
  divergence estimator routed to the EXACT trace-of-Jacobian on both sides
  (reference `divergence_exact`, run_nerf_helpers.py:73-104 — the
  training_wrapper hard-codes the stochastic estimator, so the module-level
  `divergence_approx` name it resolves is pointed at the exact one; ours
  takes `exact=True`).
- gradients are extracted from the production jitted step by running it
  with an SGD(lr=1) optimizer: params_old - params_new == gradients.
"""

import functools
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

R = 16              # rays in the batch
T = 4               # timesteps (timestep 3 is the "test" split)
NEAR, FAR = 2.0, 6.0
GLOBAL_STEP = 1234
LATENT = 32


_REF_TRAIN_CACHE = []


def load_ref_train_module():
    """The reference train.py loaded as a module on CPU (cached; also used
    by tests/test_interop.py)."""
    if _REF_TRAIN_CACHE:
        return _REF_TRAIN_CACHE[0]
    if str(REFERENCE_DIR) not in sys.path:
        sys.path.append(str(REFERENCE_DIR))
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.get_device = lambda self: "cpu"
    spec = importlib.util.spec_from_file_location(
        "ref_train_mod", str(REFERENCE_DIR / "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _REF_TRAIN_CACHE.append(mod)
    return mod


@pytest.fixture(scope="module")
def ref_train():
    if not (REFERENCE_DIR / "train.py").exists():
        pytest.skip("no reference")
    return load_ref_train_module()


import contextlib


@contextlib.contextmanager
def torch_default_dtype(dtype):
    saved = torch.get_default_dtype()
    torch.set_default_dtype(dtype)
    try:
        yield
    finally:
        torch.set_default_dtype(saved)


def make_ref_args(tmp_path, **overrides):
    """The reference args namespace (configargparse is unavailable, so the
    defaults of reference config_parser, train.py:983-1219, are inlined)."""
    args = types.SimpleNamespace(
        multires=10, i_embed=0, ray_bending="simple_neural",
        ray_bending_latent_size=LATENT, time_conditioned_baseline=False,
        offsets_loss_weight=60.0, divergence_loss_weight=3.0,
        rigidity_loss_weight=5e-4, use_viewdirs=False, multires_views=4,
        approx_nonrigid_viewdirs=True, netchunk=65536, N_samples=16,
        N_importance=16, netdepth=8, netwidth=256, netdepth_fine=8,
        netwidth_fine=256, perturb=0.0, raw_noise_std=0.0, lrate=5e-4,
        rootdir=str(tmp_path), expname="ref_e2e", ft_path=None,
        no_reload=False, chunk=4096, N_iters=200000, N_rand=R,
        lrate_decay=250000)
    for k, v in overrides.items():
        setattr(args, k, v)
    os.makedirs(os.path.join(args.rootdir, args.expname, "logs"),
                exist_ok=True)
    return args


def build_reference(ref_train, args):
    """create_nerf + non-trivial final layers (zero-init would make the
    bending/rigidity losses vacuous)."""
    torch.manual_seed(0)
    latents = [(0.1 * torch.randn(LATENT)).clone().requires_grad_()
               for _ in range(T)]
    (rk_train, _, start, _, _) = ref_train.create_nerf(
        args, latents, ignore_optimizer=True)
    rk_train.update({"near": NEAR, "far": FAR})
    bender = rk_train["ray_bender"]
    if bender is not None:
        with torch.no_grad():
            bender.network[-1].weight.normal_(0, 0.05)
            bender.rigidity_network[-1].weight.normal_(0, 0.5)
            bender.rigidity_network[-1].bias.normal_(0, 0.5)
    return rk_train, latents, start


def make_batch():
    rng = np.random.RandomState(0)
    rays_o = 0.1 * rng.randn(R, 3).astype(np.float32)
    rays_d = rng.randn(R, 3).astype(np.float32)
    rays_d[:, 2] -= 2.0
    target = rng.rand(R, 3).astype(np.float32)
    image_ids = rng.randint(0, T, size=R)
    assert (image_ids == T - 1).any() and (image_ids != T - 1).any()
    return rays_o, rays_d, target, image_ids


def reference_step(ref_train, rk_train, latents, args, start):
    """One reference forward + the exact two-phase backward of
    reference train.py:1594-1608. Returns (per-ray losses, grads dict)."""
    import run_nerf_helpers as ref_helpers
    # deterministic divergence: the wrapper hard-codes exact=False; its
    # divergence_fn resolves `divergence_approx` from module globals
    saved = ref_helpers.divergence_approx
    ref_helpers.divergence_approx = ref_helpers.divergence_exact
    try:
        rays_o, rays_d, target, image_ids = make_batch()
        pix = torch.tensor(
            np.stack([image_ids, np.zeros(R), np.zeros(R)], -1),
            dtype=torch.long)
        wrapper = ref_train.training_wrapper_class(
            rk_train["network_fn"], latents,
            fine_model=rk_train["network_fine"],
            ray_bender=rk_train["ray_bender"])
        losses = wrapper(
            args, torch.tensor(rays_o), torch.tensor(rays_d), 100, rk_train,
            torch.tensor(target), GLOBAL_STEP, start,
            {"imageid_to_timestepid": list(range(T))}, pix)

        test_ind = torch.tensor((image_ids == T - 1).astype(np.float32))
        train_ind = 1.0 - test_ind
        coarse, fine = rk_train["network_fn"], rk_train["network_fine"]
        bender = rk_train["ray_bender"]
        net_params = (list(coarse.parameters())
                      + list([] if fine is None else fine.parameters())
                      + list([] if bender is None else bender.parameters()))
        # the reference gates the test-latent phase on `ray_bender is not
        # None` (train.py:1594), so in time_conditioned_baseline mode its
        # test latents NEVER receive gradients (test-set renders would use
        # untrained latents). Ours trains them — a documented deviation
        # (PARITY.md) — so the harness enables the phase for the baseline
        # too, verifying the gradient MATH against the reference.
        two_phase = bender is not None or getattr(
            args, "time_conditioned_baseline", False)
        if two_phase and torch.sum(test_ind) > 0:
            (test_ind * losses).mean().backward(retain_graph=True)
            for w in net_params:
                w.grad = None
        (train_ind * losses).mean().backward()

        def lin_grad(linear):
            g = {"w": linear.weight.grad.detach().numpy().T}
            if linear.bias is not None:
                g["b"] = linear.bias.grad.detach().numpy()
            return g

        def net_grads(net):
            out = {"pts": [lin_grad(l) for l in net.pts_linears]}
            if net.use_viewdirs:
                out.update(feature=lin_grad(net.feature_linear),
                           alpha=lin_grad(net.alpha_linear),
                           views=[lin_grad(l) for l in net.views_linears],
                           rgb=lin_grad(net.rgb_linear))
            else:
                out["output"] = lin_grad(net.output_linear)
            return out

        grads = {
            "coarse": net_grads(coarse),
            "fine": net_grads(fine),
            "latents": np.stack(
                [np.zeros(LATENT, np.float32) if l.grad is None
                 else l.grad.detach().numpy() for l in latents]),
        }
        if bender is not None:
            grads["bender"] = {
                "bend": [lin_grad(l) for l in bender.network],
                "rigidity": [lin_grad(l) for l in bender.rigidity_network]}
        return losses.detach().numpy(), grads
    finally:
        ref_helpers.divergence_approx = saved


def params_from_reference(rk_train, latents):
    from tests.test_models import _torch_linear_to_pytree as conv
    import jax.numpy as jnp
    coarse, fine = rk_train["network_fn"], rk_train["network_fine"]
    bender = rk_train["ray_bender"]

    def net_params(net):
        out = {"pts": [conv(l) for l in net.pts_linears]}
        if net.use_viewdirs:
            out.update(feature=conv(net.feature_linear),
                       alpha=conv(net.alpha_linear),
                       views=[conv(l) for l in net.views_linears],
                       rgb=conv(net.rgb_linear))
        else:
            out["output"] = conv(net.output_linear)
        return out

    params = {
        "coarse": net_params(coarse),
        "fine": net_params(fine),
        "latents": jnp.asarray(
            np.stack([l.detach().numpy() for l in latents])),
    }
    if bender is not None:
        params["bender"] = {
            "bend": [conv(l) for l in bender.network],
            "rigidity": [conv(l) for l in bender.rigidity_network]}
    return params


def jax_configs():
    from nonrigid_nerf_tpu.config import (ModelConfig, RenderSettings,
                                          TrainConfig)
    cfg = ModelConfig(N_samples=16, N_importance=16, fused_kernel="off")
    rs = RenderSettings(N_samples=16, N_importance=16, near=NEAR, far=FAR,
                        perturb=0.0, raw_noise_std=0.0)
    tc = TrainConfig(N_rand=R, offsets_loss_weight=60.0,
                     divergence_loss_weight=3.0, rigidity_loss_weight=5e-4,
                     N_iters=200000)
    return cfg, rs, tc


def exact_divergence(monkeypatch):
    from nonrigid_nerf_tpu.engine import losses as losses_mod
    orig = losses_mod.divergence_loss
    monkeypatch.setattr(losses_mod, "divergence_loss",
                        functools.partial(orig, exact=True))


def jax_per_ray_losses(params, image_ids, target):
    import jax
    import jax.numpy as jnp
    from nonrigid_nerf_tpu.engine.losses import per_ray_losses
    from nonrigid_nerf_tpu.engine.render import render_rays
    cfg, rs, tc = jax_configs()
    rays_o, rays_d, target_np, _ = make_batch()
    dt = params["coarse"]["pts"][0]["w"].dtype
    lat = params["latents"][jnp.asarray(image_ids)]
    out = render_rays(params, cfg, rs, jnp.asarray(rays_o, dt),
                      jnp.asarray(rays_d, dt), lat, key=jax.random.PRNGKey(0),
                      detailed=True, fine_detailed=False)
    losses, aux = per_ray_losses(jax.random.PRNGKey(1), params, cfg, tc, out,
                                 jnp.asarray(target_np, dt), lat,
                                 jnp.asarray(GLOBAL_STEP))
    return np.asarray(losses), aux


LR_POW2 = float(2 ** 24)


def jax_step_grads(params, monkeypatch):
    """Gradients out of the PRODUCTION jitted train_step: with SGD at a
    power-of-two learning rate, (params_old - params_new) / lr recovers the
    gradient tree. The lr is 2^24 so the update dwarfs the parameter value
    and the subtraction stays exact down to ~1e-11-scale gradients (at
    lr=1, any gradient below ulp(param) ~ 6e-8 would vanish in the
    subtraction). The on-device batch sampler is replaced by the fixed
    parity batch."""
    import jax
    import jax.numpy as jnp
    import optax
    from nonrigid_nerf_tpu.engine import train_step as ts_mod
    from nonrigid_nerf_tpu.engine.train_state import TrainState

    cfg, rs, tc = jax_configs()
    rays_o, rays_d, target, image_ids = make_batch()
    # the harness runs in f32 or (for the exact-parity variant) f64;
    # follow the parameter dtype throughout the batch
    dt = params["coarse"]["pts"][0]["w"].dtype
    test_ind = (image_ids == T - 1).astype(dt)
    batch = {
        "rays_o": jnp.asarray(rays_o, dt), "rays_d": jnp.asarray(rays_d, dt),
        "target_rgb": jnp.asarray(target, dt),
        "image_ids": jnp.asarray(image_ids),
        "timestep_ids": jnp.asarray(image_ids),
        "train_indicator": jnp.asarray(1.0 - test_ind),
        "test_indicator": jnp.asarray(test_ind),
    }
    monkeypatch.setattr(ts_mod, "sample_ray_batch",
                        lambda key, ds, n_rand: batch)

    optimizer = optax.sgd(LR_POW2)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.asarray(GLOBAL_STEP, jnp.int32))
    step_fn = jax.jit(functools.partial(
        ts_mod.train_step, cfg=cfg, tc=tc, rs=rs, optimizer=optimizer,
        has_test_split=True, n_rand=R))
    new_state, metrics = step_fn(state, None, jax.random.PRNGKey(7))
    grads = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a - b) / LR_POW2, params, new_state.params)
    return grads, metrics


def assert_tree_close(got, want, rtol, atol, path=""):
    """Leaf-by-leaf NORMWISE comparison of two identically-shaped pytrees:
    per leaf, ||got - want|| <= rtol * ||want|| + atol. Normwise is the
    right criterion for gradients: elementwise relative comparison is
    meaningless for near-cancelling entries, and the fp-noise floor of the
    whole reverse pass is shared across the leaf."""
    if isinstance(want, dict):
        assert set(got.keys()) == set(want.keys()), path
        for k in want:
            assert_tree_close(got[k], want[k], rtol, atol, f"{path}/{k}")
    elif isinstance(want, list):
        for i, (g, w) in enumerate(zip(got, want)):
            assert_tree_close(g, w, rtol, atol, f"{path}[{i}]")
    else:
        got = np.asarray(got)
        want = np.asarray(want)
        diff = float(np.linalg.norm(got - want))
        ref = float(np.linalg.norm(want))
        assert diff <= rtol * ref + atol, (
            f"gradient leaf {path}: ||diff||={diff:.3e} vs "
            f"rtol*||ref||+atol={rtol * ref + atol:.3e} (||ref||={ref:.3e})")


# Tolerances per dtype. The f32 bound is set by an intrinsic mechanism, not
# sloppiness: det sample_pdf inverts the coarse CDF, so backend-dependent
# transcendental rounding in the coarse pass (torch vs XLA exp/sin differ at
# ~1 ulp) is amplified by 1/pdf where the CDF is flat — measured up to
# ~1e-3 displacement of individual fine sample points, i.e. ~5e-3 normwise
# on the fine-MLP gradient leaves. The f64 variant shrinks that same
# mechanism to ~1e-7 and is the exact-parity statement: every remaining
# difference is provably fp noise, not semantics.
TOL = {
    "float32": {"loss_rtol": 2e-4, "grad_rtol": 1e-2, "grad_atol": 1e-6},
    "float64": {"loss_rtol": 1e-6, "grad_rtol": 1e-4, "grad_atol": 1e-12},
}


@contextlib.contextmanager
def jax_dtype_context(dtype: str):
    if dtype == "float64":
        import jax
        with jax.enable_x64():
            yield
    else:
        yield


def with_compute_dtype(dtype: str, monkeypatch):
    """Point the module-level jax_configs at a compute_dtype override.

    NOTE: the patch targets THIS module instance via sys.modules[__name__].
    tests/ is a namespace package, so pytest imports this file as
    `test_reference_e2e` while a dotted-string setattr would resolve (and
    patch) a SECOND instance under `tests.test_reference_e2e` — leaving the
    running code unpatched.
    """
    if dtype == "float32":
        return
    import dataclasses
    base = jax_configs
    monkeypatch.setattr(
        sys.modules[__name__], "jax_configs",
        lambda: (dataclasses.replace(base()[0], compute_dtype=dtype),
                 base()[1], base()[2]))


@requires_reference
class TestOneStepTrainParity:
    """The full-composition closure test (VERDICT r2 item 1), in f32
    (practical parity) and f64 (exact parity — all noise sources shrunk to
    provably-floating-point scale)."""

    @pytest.fixture(scope="class", params=["float32", "float64"])
    def ref_side(self, request, ref_train, tmp_path_factory):
        dtype = request.param
        with torch_default_dtype(getattr(torch, dtype)):
            args = make_ref_args(tmp_path_factory.mktemp("ref_e2e"))
            rk_train, latents, start = build_reference(ref_train, args)
            losses, grads = reference_step(ref_train, rk_train, latents,
                                           args, start)
        return dtype, losses, grads, rk_train, latents

    def test_per_ray_losses_match(self, ref_side, monkeypatch):
        dtype, ref_losses, _, rk_train, latents = ref_side
        with_compute_dtype(dtype, monkeypatch)
        exact_divergence(monkeypatch)
        _, _, target, image_ids = make_batch()
        with jax_dtype_context(dtype):
            params = params_from_reference(rk_train, latents)
            got, aux = jax_per_ray_losses(params, image_ids, target)
        assert got.shape == (R,)
        np.testing.assert_allclose(got, ref_losses,
                                   rtol=TOL[dtype]["loss_rtol"], atol=0)
        # every component is live in this configuration
        assert {"img_loss", "img_loss0", "offsets_loss",
                "divergence_loss"} <= set(aux)

    def test_all_gradient_leaves_match(self, ref_side, monkeypatch):
        dtype, _, ref_grads, rk_train, latents = ref_side
        with_compute_dtype(dtype, monkeypatch)
        exact_divergence(monkeypatch)
        with jax_dtype_context(dtype):
            params = params_from_reference(rk_train, latents)
            assert str(params["coarse"]["pts"][0]["w"].dtype) == dtype
            grads, metrics = jax_step_grads(params, monkeypatch)
        grads.pop("quant", None)
        assert set(grads.keys()) == set(ref_grads.keys())
        assert_tree_close(grads, ref_grads, rtol=TOL[dtype]["grad_rtol"],
                          atol=TOL[dtype]["grad_atol"])
        assert np.isfinite(float(metrics["loss"]))

    def test_two_phase_semantics_in_reference_grads(self, ref_side):
        """The harness itself must reproduce the reference's two-phase
        behavior: test-timestep latents got gradients even though network
        grads were wiped between the phases."""
        _, _, ref_grads, _, _ = ref_side
        lat_grads = ref_grads["latents"]
        _, _, _, image_ids = make_batch()
        for t in range(T):
            if (image_ids == t).any():
                assert np.abs(lat_grads[t]).max() > 0, f"timestep {t}"


@requires_reference
class TestOneStepTrainParityNoBending:
    """Same closure for the plain-NeRF configuration (ray_bending=None):
    no bender, no regularizers, single-phase gradients."""

    @pytest.fixture(scope="class")
    def ref_side(self, ref_train, tmp_path_factory):
        args = make_ref_args(
            tmp_path_factory.mktemp("ref_e2e_nb"), ray_bending=None,
            offsets_loss_weight=0.0, divergence_loss_weight=0.0,
            rigidity_loss_weight=0.0)
        rk_train, latents, start = build_reference(ref_train, args)
        losses, grads = reference_step(ref_train, rk_train, latents, args,
                                       start)
        params = params_from_reference(rk_train, latents)
        return losses, grads, params

    def test_losses_and_grads_match(self, ref_side, monkeypatch):
        import dataclasses
        ref_losses, ref_grads, params = ref_side
        base = jax_configs

        def nb_cfgs():
            cfg, rs, tc = base()
            cfg = dataclasses.replace(cfg, ray_bending=None)
            tc = dataclasses.replace(tc, offsets_loss_weight=0.0,
                                     divergence_loss_weight=0.0,
                                     rigidity_loss_weight=0.0)
            return cfg, rs, tc

        monkeypatch.setattr(sys.modules[__name__], "jax_configs", nb_cfgs)
        got, _ = jax_per_ray_losses(params, make_batch()[3], None)
        np.testing.assert_allclose(got, ref_losses, rtol=2e-4, atol=1e-6)
        grads, _ = jax_step_grads(params, monkeypatch)
        # without a bender the latent table is untrained in the reference
        # (it still gets zero grads from the unused lookup on our side)
        np.testing.assert_allclose(grads.pop("latents"), 0.0, atol=1e-8)
        ref_grads = dict(ref_grads)
        ref_grads.pop("latents")
        assert_tree_close(grads, ref_grads,
                          rtol=TOL["float32"]["grad_rtol"],
                          atol=TOL["float32"]["grad_atol"])


@requires_reference
class TestOneStepTrainParityViewdirs:
    """The same full-composition closure for the view-direction modes:
    approx (finite-difference nonrigid dirs) and exact (bending-Jacobian
    dirs). approx runs in f32 and f64; exact runs in f32 only — the
    reference normalizes as `d/|d| + eps` (a literal quirk at
    run_nerf_helpers.py:378-381) while we compute `d/(|d|+eps)` (a
    documented deviation, PARITY.md), which shows up at ~1e-5 relative and
    would dominate an f64 comparison."""

    @pytest.fixture(scope="class",
                    params=[("approx", "float32"), ("approx", "float64"),
                            ("exact", "float32")],
                    ids=["approx-f32", "approx-f64", "exact-f32"])
    def ref_side(self, request, ref_train, tmp_path_factory):
        mode, dtype = request.param
        with torch_default_dtype(getattr(torch, dtype)):
            args = make_ref_args(
                tmp_path_factory.mktemp("ref_e2e_vd"), use_viewdirs=True,
                approx_nonrigid_viewdirs=(mode == "approx"))
            rk_train, latents, start = build_reference(ref_train, args)
            losses, grads = reference_step(ref_train, rk_train, latents,
                                           args, start)
        return mode, dtype, losses, grads, rk_train, latents

    def _patch_cfgs(self, mode, dtype, monkeypatch):
        import dataclasses
        base = jax_configs

        def cfgs():
            cfg, rs, tc = base()
            cfg = dataclasses.replace(
                cfg, use_viewdirs=True,
                approx_nonrigid_viewdirs=(mode == "approx"),
                compute_dtype=dtype)
            return cfg, rs, tc

        monkeypatch.setattr(sys.modules[__name__], "jax_configs", cfgs)

    def test_losses_and_all_gradient_leaves_match(self, ref_side,
                                                  monkeypatch):
        mode, dtype, ref_losses, ref_grads, rk_train, latents = ref_side
        self._patch_cfgs(mode, dtype, monkeypatch)
        exact_divergence(monkeypatch)
        tol = dict(TOL[dtype])
        if mode == "exact":
            # the documented normalization deviation (see class docstring)
            tol["loss_rtol"] = max(tol["loss_rtol"], 5e-4)
            tol["grad_rtol"] = max(tol["grad_rtol"], 2e-2)
        elif dtype == "float64":
            # FD viewdirs normalize differences of consecutive fine
            # samples, whose positions already carry the 1/pdf-amplified
            # backend rounding (see TOL) — near-duplicate samples amplify
            # it again (measured worst leaf ~1.2e-3 normwise)
            tol["grad_rtol"] = max(tol["grad_rtol"], 5e-3)
        with jax_dtype_context(dtype):
            params = params_from_reference(rk_train, latents)
            _, _, target, image_ids = make_batch()
            got, aux = jax_per_ray_losses(params, image_ids, target)
            np.testing.assert_allclose(got, ref_losses,
                                       rtol=tol["loss_rtol"], atol=0)
            grads, _ = jax_step_grads(params, monkeypatch)
        assert set(grads.keys()) == set(ref_grads.keys())
        assert_tree_close(grads, ref_grads, rtol=tol["grad_rtol"],
                          atol=tol["grad_atol"])


@requires_reference
class TestOneStepTrainParityBaseline:
    """Same closure for the time-conditioned naive baseline
    (reference run_nerf_helpers.py:207-209, 273-282): the latent is
    concatenated into the canonical MLP input (also at the skip), no
    bender, no regularizers — but the latent TABLE trains through the
    input path."""

    @pytest.fixture(scope="class")
    def ref_side(self, ref_train, tmp_path_factory):
        args = make_ref_args(
            tmp_path_factory.mktemp("ref_e2e_tc"), ray_bending=None,
            time_conditioned_baseline=True, offsets_loss_weight=0.0,
            divergence_loss_weight=0.0, rigidity_loss_weight=0.0)
        rk_train, latents, start = build_reference(ref_train, args)
        losses, grads = reference_step(ref_train, rk_train, latents, args,
                                       start)
        params = params_from_reference(rk_train, latents)
        return losses, grads, params

    def test_losses_and_grads_match(self, ref_side, monkeypatch):
        import dataclasses
        ref_losses, ref_grads, params = ref_side
        base = jax_configs

        def tc_cfgs():
            cfg, rs, tc = base()
            cfg = dataclasses.replace(cfg, ray_bending=None,
                                      time_conditioned_baseline=True)
            tc = dataclasses.replace(tc, offsets_loss_weight=0.0,
                                     divergence_loss_weight=0.0,
                                     rigidity_loss_weight=0.0)
            return cfg, rs, tc

        monkeypatch.setattr(sys.modules[__name__], "jax_configs", tc_cfgs)
        got, _ = jax_per_ray_losses(params, make_batch()[3], None)
        np.testing.assert_allclose(got, ref_losses, rtol=2e-4, atol=1e-6)
        grads, _ = jax_step_grads(params, monkeypatch)
        # the latent table TRAINS in this mode (through the MLP input)
        assert np.abs(grads["latents"]).max() > 0
        assert_tree_close(grads, ref_grads,
                          rtol=TOL["float32"]["grad_rtol"],
                          atol=TOL["float32"]["grad_atol"])


@requires_reference
class TestMultiStepAdamTrajectory:
    """Three full optimization steps vs the reference: torch Adam + the
    per-step LR decay/warmup formula (reference train.py:1631-1643) against
    the production jitted step with its optax schedule. Same fixed batch
    every step (batch CONTENT parity is separate); f64 so remaining
    differences are provably fp noise. This extends the one-step gradient
    parity to the full optimizer loop: moments, bias correction, warmup
    divisor, schedule."""

    N_OPT_STEPS = 3

    def test_params_after_three_steps_match(self, ref_train, tmp_path,
                                            monkeypatch):
        import dataclasses
        with torch_default_dtype(torch.float64):
            args = make_ref_args(tmp_path)
            torch.manual_seed(0)
            latents = [(0.1 * torch.randn(LATENT)).clone().requires_grad_()
                       for _ in range(T)]
            (rk_train, _, start, grad_vars,
             optimizer) = ref_train.create_nerf(args, latents,
                                                ignore_optimizer=False)
            rk_train.update({"near": NEAR, "far": FAR})
            bender = rk_train["ray_bender"]
            with torch.no_grad():
                bender.network[-1].weight.normal_(0, 0.05)
                bender.rigidity_network[-1].weight.normal_(0, 0.5)
                bender.rigidity_network[-1].bias.normal_(0, 0.5)

            import run_nerf_helpers as ref_helpers
            monkeypatch.setattr(ref_helpers, "divergence_approx",
                                ref_helpers.divergence_exact)

            with jax_dtype_context("float64"):
                import jax as _jax
                # FORCE copies: on CPU jnp.asarray can alias the torch
                # storage through .detach().numpy(), and the torch loop
                # below mutates the weights in place
                params0 = _jax.tree_util.tree_map(
                    lambda x: np.array(x, copy=True),
                    params_from_reference(rk_train, latents))

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

            for global_step in range(self.N_OPT_STEPS):
                optimizer.zero_grad()
                for latent in latents:
                    latent.grad = None
                losses = wrapper(
                    args, torch.tensor(rays_o, dtype=torch.float64),
                    torch.tensor(rays_d, dtype=torch.float64), 100,
                    rk_train, torch.tensor(target, dtype=torch.float64),
                    global_step, start,
                    {"imageid_to_timestepid": list(range(T))}, pix)
                if torch.sum(test_ind) > 0:
                    (test_ind * losses).mean().backward(retain_graph=True)
                    for w in (list(rk_train["network_fn"].parameters())
                              + list(rk_train["network_fine"].parameters())
                              + list(bender.parameters())):
                        w.grad = None
                (train_ind * losses).mean().backward()
                optimizer.step()
                # the reference's LR update runs AFTER the step with the
                # PRE-increment global_step (train.py:1631-1643; += 1 at
                # :1952), so step k+1 runs at the value computed from k
                decay_rate, warming_up = 0.1, 1000
                new_lrate = args.lrate * (
                    decay_rate ** (global_step / args.lrate_decay))
                if global_step < warming_up:
                    new_lrate /= (20.0 * (-(global_step - warming_up)
                                          / warming_up) + 1.0)
                for group in optimizer.param_groups:
                    group["lr"] = new_lrate

        # ours: the production jitted step, N_OPT_STEPS times
        base = jax_configs
        monkeypatch.setattr(
            sys.modules[__name__], "jax_configs",
            lambda: (dataclasses.replace(base()[0],
                                         compute_dtype="float64"),
                     base()[1], base()[2]))
        exact_divergence(monkeypatch)
        with jax_dtype_context("float64"):
            import jax
            import jax.numpy as jnp
            import optax
            from nonrigid_nerf_tpu.engine import train_step as ts_mod
            from nonrigid_nerf_tpu.engine.train_state import (TrainState,
                                                              make_optimizer)
            cfg, rs, tc = jax_configs()
            # the reference initializes lr to args.lrate and applies the
            # formula only after each step; our schedule must be evaluated
            # at the same points -> same tc defaults (lrate 5e-4,
            # warmup 1000, decay 250000 match make_ref_args)
            dt = params0["coarse"]["pts"][0]["w"].dtype
            test_np = (image_ids == T - 1).astype(np.float64)
            batch = {
                "rays_o": jnp.asarray(rays_o, dt),
                "rays_d": jnp.asarray(rays_d, dt),
                "target_rgb": jnp.asarray(target, dt),
                "image_ids": jnp.asarray(image_ids),
                "timestep_ids": jnp.asarray(image_ids),
                "train_indicator": jnp.asarray(1.0 - test_np),
                "test_indicator": jnp.asarray(test_np),
            }
            monkeypatch.setattr(ts_mod, "sample_ray_batch",
                                lambda key, ds, n_rand: batch)
            optimizer = make_optimizer(
                dataclasses.replace(tc, lrate=5e-4, lrate_decay=250000))
            state = TrainState(params=params0,
                               opt_state=optimizer.init(params0),
                               step=jnp.asarray(0, jnp.int32))
            step_fn = jax.jit(functools.partial(
                ts_mod.train_step, cfg=cfg, tc=tc, rs=rs,
                optimizer=optimizer, has_test_split=True, n_rand=R))
            for _ in range(self.N_OPT_STEPS):
                state, metrics = step_fn(state, None, jax.random.PRNGKey(7))

        with jax_dtype_context("float64"):
            ref_params = jax.tree_util.tree_map(
                lambda x: np.array(x, copy=True),
                params_from_reference(rk_train, latents))
        # compare the PARAMETER DELTAS (the params themselves are O(1)
        # while three Adam steps move them by ~3*lr)
        import jax
        for (path, a0), (_, a1), (_, b1) in zip(
                jax.tree_util.tree_flatten_with_path(params0)[0],
                jax.tree_util.tree_flatten_with_path(state.params)[0],
                jax.tree_util.tree_flatten_with_path(ref_params)[0]):
            da = np.asarray(a1) - np.asarray(a0)
            db = np.asarray(b1) - np.asarray(a0)
            diff = np.linalg.norm(da - db)
            ref = np.linalg.norm(db)
            # Adam normalizes each update by sqrt(v)+eps, so leaves whose
            # gradients sit at the fp-noise floor (the rigidity net; see
            # TOL) get sign-like updates where that noise is amplified to
            # ~1e-4 of the delta; 5e-4 still pins the full optimizer loop
            assert diff <= 5e-4 * ref + 1e-12, (
                f"{jax.tree_util.keystr(path)}: |d_ours-d_ref|={diff:.3e} "
                f"|d_ref|={ref:.3e}")
