"""NR-NeRF training losses.

Behavioral contract (reference: training_wrapper_class.forward,
train.py:208-286, and compute_divergence_loss, run_nerf_helpers.py:22-116):

- reconstruction: per-ray MSE of fine + coarse rgb.
- offsets loss: per-ray mean over coarse samples of
    w * ||unmasked_offsets||^(2 - rigidity),
  w = detached coarse visibility weights, plus
  rigidity_loss_weight * mean(w * rigidity).
- divergence loss: Hutchinson estimate of div(offsets) at the coarse sample
  points, squared, weighted by detached (1 - exp(-relu(coarse alpha))).
- both regularizers are scaled by the increasing schedule
    weight * (1/100)^(1 - step/N_iters).

TPU-first design: the divergence estimator is a forward-mode jvp (the outer
backward pass then differentiates *through* it, i.e. reverse-over-forward) —
no FFJORD-style autograd.grad-inside-forward, no re-running the bender in
host-side chunks.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from nonrigid_nerf_tpu.config import ModelConfig, TrainConfig
from nonrigid_nerf_tpu.models.bending import bend_points
from nonrigid_nerf_tpu.ops.math import img2mse, safe_norm, safe_pow


def loss_schedule_factor(step, n_iters: int, dtype=jnp.float32):
    """Increasing schedule (1/100)^(1 - step/N_iters)
    (reference: train.py:237-242)."""
    frac = jnp.asarray(step, dtype) / float(n_iters)
    return jnp.power(jnp.asarray(0.01, dtype), 1.0 - frac)


def offsets_and_rigidity_loss(render_out, rigidity_loss_weight: float):
    """Per-ray offsets + rigidity regularizer (reference: train.py:219-236).

    Without a rigidity network there is no mask/exponent modulation; the loss
    degrades to the plain weighted L1 of the offsets (the reference's
    commented-out no-rigidity variant, train.py:232-234) and the rigidity
    term vanishes."""
    offsets = render_out["unmasked_offsets"]            # (R, S, 3)
    weights = jax.lax.stop_gradient(
        render_out["visibility_weights"])               # (R, S) coarse
    norm = safe_norm(offsets, axis=-1)

    if "rigidity_mask" not in render_out:
        return jnp.mean(weights * norm, axis=-1)        # (R,)

    rigidity = render_out["rigidity_mask"][..., 0]      # (R, S)
    per_sample = weights * safe_pow(norm, 2.0 - rigidity)
    loss = jnp.mean(per_sample, axis=-1)                # (R,)
    loss = loss + rigidity_loss_weight * jnp.mean(weights * rigidity, axis=-1)
    return loss


def divergence_loss(key, params, cfg: ModelConfig, render_out, latents,
                    exact: bool = False):
    """Per-ray divergence regularizer (reference: train.py:244-280,
    run_nerf_helpers.py:22-116).

    The offsets field is linearized at the *detached* coarse sample points
    (gradients flow into the bender parameters and latents only, matching
    the reference's fresh requires_grad leaf on initial_input_pts).
    """
    pts = jax.lax.stop_gradient(render_out["initial_input_pts"])  # (R, S, 3)
    R, S = pts.shape[:-1]
    latents_per_pt = jnp.broadcast_to(latents[..., None, :],
                                      (R, S, latents.shape[-1]))
    bender = params["bender"]

    def offsets_at(p):
        _, details = bend_points(bender, p, latents_per_pt,
                                 compute_dtype=jnp.dtype(cfg.compute_dtype),
                                 activation=cfg.bending_activation)
        return details.get("masked_offsets", details["unmasked_offsets"])

    if exact:
        # trace of the Jacobian via 3 basis-vector jvp probes
        div = jnp.zeros(pts.shape[:-1], pts.dtype)
        for i in range(3):
            e = jnp.zeros_like(pts).at[..., i].set(1.0)
            _, je = jax.jvp(offsets_at, (pts,), (e,))
            div = div + je[..., i]
    else:
        e = jax.random.normal(key, pts.shape, pts.dtype)
        _, je = jax.jvp(offsets_at, (pts,), (e,))
        div = jnp.sum(je * e, axis=-1)                  # e^T J e  (R, S)

    # weights: 1 - exp(-relu(coarse alpha)), detached
    # (reference: train.py:262-267 — yes, alpha is pushed through the alpha
    # formula a second time; matched for parity)
    alpha = jax.lax.stop_gradient(render_out["opacity_alpha"])
    weights = 1.0 - jnp.exp(-jax.nn.relu(alpha))

    return jnp.mean(weights * jnp.square(jnp.abs(div)), axis=-1)  # (R,)


def per_ray_losses(key, params, cfg: ModelConfig, tc: TrainConfig,
                   render_out, target_rgb, latents, step):
    """Total per-ray training loss (R,) plus a dict of unweighted components
    (reference: training_wrapper_class.forward, train.py:152-286)."""
    R = target_rgb.shape[0]
    img_loss = img2mse(render_out["rgb_map"], target_rgb, R)
    loss = img_loss
    aux = {"img_loss": img_loss}

    if "rgb0" in render_out:
        img_loss0 = img2mse(render_out["rgb0"], target_rgb, R)
        loss = loss + img_loss0
        aux["img_loss0"] = img_loss0

    needs_bending_losses = cfg.use_ray_bending and (
        tc.offsets_loss_weight > 0.0 or tc.divergence_loss_weight > 0.0)
    if needs_bending_losses:
        sched = loss_schedule_factor(step, tc.N_iters, img_loss.dtype)
        if tc.offsets_loss_weight > 0.0:
            off = offsets_and_rigidity_loss(render_out, tc.rigidity_loss_weight)
            loss = loss + tc.offsets_loss_weight * sched * off
            aux["offsets_loss"] = off
        if tc.divergence_loss_weight > 0.0:
            div = divergence_loss(key, params, cfg, render_out, latents)
            loss = loss + tc.divergence_loss_weight * sched * div
            aux["divergence_loss"] = div
    return loss, aux
