"""The jitted NR-NeRF training step.

One fused XLA program per step: on-device pixel sampling -> ray generation ->
latent lookup -> coarse+fine volumetric rendering -> per-ray losses ->
two-phase gradients -> Adam update. The reference spreads this across numpy
sampling, a host->GPU copy, DataParallel scatter/gather, two backward passes
with retain_graph, and a Python-side LR update (reference:
train.py:1534-1643); here the host only feeds a step counter.

Two-phase gradient semantics (reference: train.py:1594-1608): rays from test
images contribute gradients ONLY to the per-timestep latent codes; rays from
training images to everything. Both phases share one forward pass via
jax.vjp with two cotangent vectors — exactly the cost profile of the
reference's two backwards over one graph, minus the retained graph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.data.dataset import RayDataset, sample_ray_batch
from nonrigid_nerf_tpu.engine.losses import per_ray_losses
from nonrigid_nerf_tpu.engine.render import render_rays
from nonrigid_nerf_tpu.engine.train_state import TrainState, make_optimizer
from nonrigid_nerf_tpu.ops.math import mse2psnr


def train_step(state: TrainState, ds: RayDataset, key, *,
               cfg: ModelConfig, tc: TrainConfig, rs: RenderSettings,
               optimizer, has_test_split: bool, n_rand: int,
               debug_metrics: bool = False):
    """One optimization step. Returns (new_state, metrics)."""
    k_batch, _, _ = jax.random.split(jax.random.fold_in(key, state.step), 3)
    batch = sample_ray_batch(k_batch, ds, n_rand)
    return train_step_from_batch(
        state, batch, key, cfg=cfg, tc=tc, rs=rs, optimizer=optimizer,
        has_test_split=has_test_split, n_rand=n_rand,
        debug_metrics=debug_metrics)


def train_step_from_batch(state: TrainState, batch, key, *,
                          cfg: ModelConfig, tc: TrainConfig,
                          rs: RenderSettings, optimizer,
                          has_test_split: bool, n_rand: int,
                          debug_metrics: bool = False):
    """The step body, with the ray batch already sampled. The render/loss
    keys are derived exactly as in the fused path (fold_in(key, step) then
    split(3)), so fused and presampled training sample identical pixels and
    use identical RNG streams (trajectories agree to float roundoff —
    the restructured program reorders a few reductions)."""
    _, k_render, k_loss = jax.random.split(
        jax.random.fold_in(key, state.step), 3)

    needs_detail = cfg.use_ray_bending and (
        tc.offsets_loss_weight > 0.0 or tc.divergence_loss_weight > 0.0)

    def losses_fn(params):
        latents = params["latents"][batch["timestep_ids"]]
        # the losses consume only COARSE-pass internals (reference
        # train.py:219-286): fine_detailed=False keeps the unused fine
        # detail channels out of the compositing sort entirely
        out = render_rays(params, cfg, rs, batch["rays_o"], batch["rays_d"],
                          latents, key=k_render, detailed=needs_detail,
                          fine_detailed=False)
        losses, aux = per_ray_losses(k_loss, params, cfg, tc, out,
                                     batch["target_rgb"], latents, state.step)
        return losses, aux

    losses, vjp_fn, aux = jax.vjp(losses_fn, state.params, has_aux=True)

    # phase 1 (always): training rays -> gradients for everything.
    # mean over the FULL batch with the indicator mask, matching the
    # reference's `mean(indicator * losses)` (train.py:1604-1607).
    inv_n = 1.0 / float(n_rand)
    grads, = vjp_fn(batch["train_indicator"] * inv_n)

    if has_test_split:
        # phase 2: test rays -> latent-table gradients only
        test_grads, = vjp_fn(batch["test_indicator"] * inv_n)
        grads = {**grads,
                 "latents": grads["latents"] + test_grads["latents"]}

    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates)

    new_state = TrainState(params=new_params, opt_state=new_opt_state,
                           step=state.step + 1)

    train_count = jnp.maximum(jnp.sum(batch["train_indicator"]), 1.0)
    def masked_mean(x):
        return jnp.sum(x * batch["train_indicator"]) / train_count

    metrics = {
        "loss": masked_mean(losses),
        "psnr": mse2psnr(masked_mean(aux["img_loss"])),
    }
    for name in ("img_loss", "img_loss0", "offsets_loss", "divergence_loss"):
        if name in aux:
            metrics[name] = masked_mean(aux[name])
    if debug_metrics:
        # per-iteration gradient audit (reference --debug analog: the
        # gradient-norm print, train.py:1617-1629)
        import optax
        metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def make_train_step(cfg: ModelConfig, tc: TrainConfig, rs: RenderSettings,
                    has_test_split: bool, n_rand: Optional[int] = None,
                    donate: bool = True, debug_metrics: bool = False):
    """Build the jitted single-device train step.

    Returns fn(state, ds, key) -> (state, metrics). The state buffers are
    donated: parameters and optimizer state update in place in HBM.
    `debug_metrics` adds a per-step global gradient norm to the metrics.
    """
    if cfg.fused_kernel == "int8":
        raise ValueError("fused_kernel='int8' is inference-only (the int8 "
                         "kernel has no backward); train with 'auto'/'on'/"
                         "'off' and quantize the checkpoint afterwards")
    optimizer = make_optimizer(tc)
    step_fn = functools.partial(
        train_step, cfg=cfg, tc=tc, rs=rs, optimizer=optimizer,
        has_test_split=has_test_split,
        n_rand=n_rand if n_rand is not None else tc.N_rand,
        debug_metrics=debug_metrics)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_prefetch_train_step(cfg: ModelConfig, tc: TrainConfig,
                             rs: RenderSettings, has_test_split: bool,
                             n_prefetch: int,
                             n_rand: Optional[int] = None,
                             donate: bool = True,
                             debug_metrics: bool = False):
    """Build the presampled-training pair (presample_fn, step_fn).

    Motivation (round-5 scale-envelope finding, tools/scale_bisect.py): on
    the tunneled TPU runtime, every execution that takes the device-resident
    image stack as an argument pays a per-call cost proportional to the
    stack size (~17.8 ms for the 2.49 GB 300-frame/720p stack — a 2.8x
    train-step slowdown), even though the gather itself is ~0.07 ms and a
    step WITHOUT the stack argument runs at full speed. So: pay the big-
    argument cost once per `n_prefetch` steps instead of every step.

      presample_fn(ds, key, step0) -> batches   # the ONLY program that
                                                # takes the image stack
      step_fn(state, batches, i, key) -> (state, metrics)

    `batches` stacks `n_prefetch` ray batches, one per upcoming step;
    `i` indexes into it (dynamic slice inside the program). Pixel sampling
    uses the same fold_in(key, step)-derived keys as the fused
    make_train_step, so presampled training draws IDENTICAL pixels with
    IDENTICAL RNG streams (trajectories agree to float roundoff; see
    tests/test_train_step.py::TestPrefetchTraining) — and it is
    resume-safe, since presampling depends only on (key, step), never on
    consumed state.
    """
    if cfg.fused_kernel == "int8":
        raise ValueError("fused_kernel='int8' is inference-only (the int8 "
                         "kernel has no backward); train with 'auto'/'on'/"
                         "'off' and quantize the checkpoint afterwards")
    optimizer = make_optimizer(tc)
    nr = n_rand if n_rand is not None else tc.N_rand

    @jax.jit
    def presample_fn(ds: RayDataset, key, step0):
        def one(step):
            k_batch, _, _ = jax.random.split(jax.random.fold_in(key, step),
                                             3)
            return sample_ray_batch(k_batch, ds, nr)
        return jax.vmap(one)(step0 + jnp.arange(n_prefetch))

    def step_body(state, batches, i, key):
        batch = jax.tree_util.tree_map(lambda x: x[i], batches)
        return train_step_from_batch(
            state, batch, key, cfg=cfg, tc=tc, rs=rs, optimizer=optimizer,
            has_test_split=has_test_split, n_rand=nr,
            debug_metrics=debug_metrics)

    step_fn = jax.jit(step_body, donate_argnums=(0,) if donate else ())
    return presample_fn, step_fn
