#!/usr/bin/env python
"""Microbench: random-pixel gather strategies against a large device-resident
image stack (the scale-envelope hot path, data/dataset.py::sample_ray_batch).

Times, per step of 1024 random pixels against an (N, H, W, 3) uint8 stack:
  a) 4D advanced indexing  images[ids, y, x]           (current code)
  b) row gather            flat2[(ids*H + y) * W + x]  on (N*H*W, 3)
  c) jnp.take              take(flat2, lin, axis=0)
Run with the stack sizes of interest: 86x384x512 (baseline) and
900x720x1280 (scale300).
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=900)
    p.add_argument("--h", type=int, default=720)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--rays", type=int, default=1024)
    args = p.parse_args()
    N, H, W, R = args.n, args.h, args.w, args.rays

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (N, H, W, 3), np.uint8))
    flat2 = images.reshape(N * H * W, 3)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def sample_a(images, key):
        ki, kx, ky = jax.random.split(key, 3)
        ids = jax.random.randint(ki, (R,), 0, N)
        x = jax.random.randint(kx, (R,), 0, W)
        y = jax.random.randint(ky, (R,), 0, H)
        return images[ids, y, x].astype(jnp.float32) / 255.0

    @jax.jit
    def sample_b(flat2, key):
        ki, kx, ky = jax.random.split(key, 3)
        ids = jax.random.randint(ki, (R,), 0, N)
        x = jax.random.randint(kx, (R,), 0, W)
        y = jax.random.randint(ky, (R,), 0, H)
        lin = (ids * H + y) * W + x
        return flat2[lin].astype(jnp.float32) / 255.0

    @jax.jit
    def sample_c(flat2, key):
        ki, kx, ky = jax.random.split(key, 3)
        ids = jax.random.randint(ki, (R,), 0, N)
        x = jax.random.randint(kx, (R,), 0, W)
        y = jax.random.randint(ky, (R,), 0, H)
        lin = (ids * H + y) * W + x
        return jnp.take(flat2, lin, axis=0).astype(jnp.float32) / 255.0

    for name, fn, arr in (("a_4d_advanced", sample_a, images),
                          ("b_flat_rows", sample_b, flat2),
                          ("c_take_axis0", sample_c, flat2)):
        ms = time_fn(fn, arr, key)
        print(f"{name}: {ms:.3f} ms / {R} pixels  "
              f"(stack {N}x{H}x{W}, {images.nbytes / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
