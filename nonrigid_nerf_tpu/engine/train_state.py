"""Train state: parameters, Adam state, step — one pytree.

The reference's optimizer covers three networks plus the per-timestep latent
codes (the auto-decoder, reference: train.py:556-664,1447-1453). Here the
latent table is simply another leaf of the params pytree, so "needs to be
Adam" bookkeeping (reference: train.py:652,1539-1541) disappears.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nonrigid_nerf_tpu.config import ModelConfig, TrainConfig
from nonrigid_nerf_tpu.models.bending import init_bending_params
from nonrigid_nerf_tpu.models.nerf import init_nerf_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def lr_schedule(tc: TrainConfig):
    """Exponential decay with the reference's warmup divisor, reproducing
    the reference's exact step alignment (reference: train.py:1631-1643):
    the LR update runs AFTER optimizer.step() with the pre-increment
    global_step, so optimizer step k uses the value computed at k-1 —
    and step 0 runs at the RAW lrate, escaping the warmup divisor
    entirely. lr(k) = lrate for k == 0, else with g = k-1:
    lrate * 0.1^(g/decay), divided by 20*(warmup-g)/warmup + 1 while
    g < warmup."""
    def schedule(count):
        g = jnp.maximum(jnp.asarray(count, jnp.float32) - 1.0, 0.0)
        lr = tc.lrate * jnp.power(0.1, g / float(tc.lrate_decay))
        warm = float(tc.warmup_steps)
        divisor = 20.0 * (warm - g) / warm + 1.0
        lr = jnp.where(g < warm, lr / divisor, lr)
        return jnp.where(jnp.asarray(count, jnp.float32) < 1.0,
                         jnp.asarray(tc.lrate, jnp.float32), lr)
    return schedule


def make_optimizer(tc: TrainConfig):
    # reference: Adam(lr, betas=(0.9, 0.999)) with torch's default eps=1e-8
    return optax.adam(learning_rate=lr_schedule(tc), b1=0.9, b2=0.999,
                      eps=1e-8)


def init_params(key, cfg: ModelConfig, num_timesteps: int):
    """Initialize all model params. Latent codes start at zero
    (reference: train.py:1447-1453)."""
    k_coarse, k_fine, k_bend = jax.random.split(key, 3)
    params = {"coarse": init_nerf_params(k_coarse, cfg)}
    if cfg.N_importance > 0:
        params["fine"] = init_nerf_params(
            k_fine, cfg, cfg.netdepth_fine, cfg.netwidth_fine)
    if cfg.use_ray_bending:
        params["bender"] = init_bending_params(k_bend, cfg)
    params["latents"] = jnp.zeros(
        (num_timesteps, cfg.ray_bending_latent_size), jnp.float32)
    return params


def create_train_state(key, cfg: ModelConfig, tc: TrainConfig,
                       num_timesteps: int) -> TrainState:
    params = init_params(key, cfg, num_timesteps)
    optimizer = make_optimizer(tc)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))
