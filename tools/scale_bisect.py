#!/usr/bin/env python
"""Bisect the 300-frame/720p throughput regression (49.6 it/s vs the
86-frame baseline's 137.9 it/s): time the real jitted train step against
synthetic device-resident stacks, with the current 4D advanced-index pixel
gather vs a flat (N*H*W, 3) row gather. Model/losses/optimizer/N_rand are
identical in every cell; only the image-stack shape and gather form vary."""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.data import build_ray_dataset, get_multi_view_mappings
from nonrigid_nerf_tpu.data.dataset import sample_ray_batch
from nonrigid_nerf_tpu.engine.train_state import create_train_state
from nonrigid_nerf_tpu.engine.train_step import make_train_step


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_ds(n, h, w):
    # random content, generated fast: one random block tiled across frames
    # (zeros-filled stacks produced physically impossible timings on the
    # tunneled runtime — presumably zero-page/compression tricks — so keep
    # the bytes genuinely random)
    rng = np.random.RandomState(0)
    block = rng.randint(0, 256, (min(n, 8), h, w, 3)).astype(np.uint8)
    reps = -(-n // block.shape[0])
    images = np.tile(block, (reps, 1, 1, 1))[:n]
    poses = np.tile(np.eye(4)[:3][None], (n, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = np.linspace(0.0, 0.5, n)
    extras = get_multi_view_mappings(n, "/nonexistent")
    intrinsics = {i: {"height": h, "width": w, "focal_x": w * 0.9,
                      "focal_y": w * 0.9, "center_x": w / 2,
                      "center_y": h / 2, "ray_bending_latent_size": 32}
                  for i in range(n)}
    return build_ray_dataset(images, poses, intrinsics, extras,
                             i_train=np.arange(n),
                             i_test=np.array([], dtype=np.int64),
                             near=1.0, far=6.0)


def _sync(out):
    # value fetch of one leaf: a barrier block_until_ready can't fake on
    # the tunneled runtime (np.asarray on a DICT would silently not sync —
    # that bug made early sampler timings meaninglessly fast)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, iters):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()
    log(f"device: {jax.devices()[0]}")
    cfg = ModelConfig()
    tc = TrainConfig(N_rand=1024, offsets_loss_weight=3.0,
                     divergence_loss_weight=0.3, rigidity_loss_weight=5e-4,
                     N_iters=100000)
    rs = RenderSettings(near=1.0, far=6.0, raw_noise_std=1.0)

    for (n, h, w) in ((86, 384, 512), (900, 720, 1280)):
        log(f"building {n}x{h}x{w} dataset on device...")
        ds = make_ds(n, h, w)
        jax.block_until_ready(ds.images)
        log("device stack ready")
        state = create_train_state(jax.random.PRNGKey(0), cfg, tc,
                                   ds.num_timesteps)
        key = jax.random.PRNGKey(1)

        sample = jax.jit(lambda k, d: sample_ray_batch(k, d, tc.N_rand))
        ms_sample = timeit(lambda: sample(key, ds), 300)
        log(f"  sample_ray_batch alone: {ms_sample:.3f} ms")

        step_fn = make_train_step(cfg, tc, rs, has_test_split=False,
                                  donate=False)
        holder = {"s": state}

        def one():
            holder["s"], m = step_fn(holder["s"], ds, key)
            return m["loss"]
        log("  compiling full step...")
        ms_step = timeit(one, args.iters)
        log(f"  FULL STEP (fused sampling): {ms_step:.3f} ms "
            f"({1000.0 / ms_step:.1f} it/s)")

        # split variant: sampling in its own tiny program, the big program
        # never sees the image stack as an operand
        from nonrigid_nerf_tpu.engine.losses import per_ray_losses
        from nonrigid_nerf_tpu.engine.render import render_rays
        from nonrigid_nerf_tpu.engine.train_state import (TrainState,
                                                          make_optimizer)
        optimizer = make_optimizer(tc)

        @jax.jit
        def step_from_batch(state, batch, key):
            k_render, k_loss = jax.random.split(
                jax.random.fold_in(key, state.step), 2)

            def losses_fn(params):
                latents = params["latents"][batch["timestep_ids"]]
                out = render_rays(params, cfg, rs, batch["rays_o"],
                                  batch["rays_d"], latents, key=k_render,
                                  detailed=True, fine_detailed=False)
                losses, aux = per_ray_losses(k_loss, params, cfg, tc, out,
                                             batch["target_rgb"], latents,
                                             state.step)
                return losses, aux

            losses, vjp_fn, aux = jax.vjp(losses_fn, state.params,
                                          has_aux=True)
            inv_n = 1.0 / float(tc.N_rand)
            grads, = vjp_fn(batch["train_indicator"] * inv_n)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                state.params, updates)
            return (TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1),
                    jnp.sum(losses * batch["train_indicator"]))

        holder2 = {"s": state}

        def one_split():
            b = sample(key, ds)
            holder2["s"], loss = step_from_batch(holder2["s"], b, key)
            return loss
        log("  compiling split step...")
        ms_split = timeit(one_split, args.iters)
        log(f"  SPLIT STEP (separate sampling jit): {ms_split:.3f} ms "
            f"({1000.0 / ms_split:.1f} it/s)")

        # residency cell: same step_from_batch, fixed prebuilt batch, the
        # image stack FREED first — isolates "big array resident in HBM"
        # from "big array is an operand of the program being timed"
        fixed_batch = jax.tree_util.tree_map(jnp.asarray, sample(key, ds))
        jax.block_until_ready(fixed_batch["rays_o"])

        # mechanism cell 1: trivial program that takes the stack as its
        # argument every call — isolates per-call argument-handling cost
        # (e.g. a runtime that copies non-donated inputs per execution)
        toucher = jax.jit(lambda a: a[0, 0, 0, 0])
        ms_touch = timeit(lambda: toucher(ds.images), args.iters)
        log(f"  ARG-TOUCH (stack passed, ~zero compute): {ms_touch:.3f} ms")

        # mechanism cell 2: stack RESIDENT in HBM but NOT an argument of
        # the timed program — isolates pure-residency/allocator effects
        holder3 = {"s": state}

        def one_fixed():
            holder3["s"], loss = step_from_batch(holder3["s"], fixed_batch,
                                                 key)
            return loss
        ms_res = timeit(one_fixed, args.iters)
        log(f"  BATCH-ONLY STEP (stack resident, not passed): "
            f"{ms_res:.3f} ms ({1000.0 / ms_res:.1f} it/s)")

        del ds
        holder3 = {"s": state}
        ms_fixed = timeit(one_fixed, args.iters)
        log(f"  BATCH-ONLY STEP (stack freed): {ms_fixed:.3f} ms "
            f"({1000.0 / ms_fixed:.1f} it/s)")
        del holder, holder2, holder3
    log("done")


if __name__ == "__main__":
    main()
