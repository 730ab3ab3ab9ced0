"""Decompose train-step time into its stages on the real device.

Times, per 196k-point workload (the reference step: 1024 rays x (64 + 128)
samples): forward-only query, forward+backward, divergence-loss jvp, the
compositing/sampling glue, and the full train step, for both the fused
Pallas path and the pure-XLA path. Run on the TPU box:

    python tools/profile_step.py
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalar fetch fences remote execution reliably (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from nonrigid_nerf_tpu.config import (ModelConfig, RenderSettings,
                                          TrainConfig)
    from nonrigid_nerf_tpu.engine.query import query_points
    from nonrigid_nerf_tpu.engine.render import render_rays
    from nonrigid_nerf_tpu.engine.train_state import create_train_state
    from nonrigid_nerf_tpu.engine.train_step import make_train_step

    R, S_c, S_f = 1024, 64, 128
    cfg = ModelConfig()
    tc = TrainConfig(N_rand=R, offsets_loss_weight=60.0,
                     divergence_loss_weight=3.0, rigidity_loss_weight=5e-4,
                     N_iters=200000)
    rs = RenderSettings(near=1.0, far=6.0, raw_noise_std=1.0)

    state = create_train_state(jax.random.PRNGKey(0), cfg, tc, 8)
    params = state.params
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(R, 3), jnp.float32)
    rays_d = jnp.asarray(rng.randn(R, 3) * 0.05 + np.array([0, 0, -1.0]),
                         jnp.float32)
    latents = jnp.zeros((R, cfg.ray_bending_latent_size))
    pts_c = jnp.asarray(rng.randn(R, S_c, 3), jnp.float32)
    pts_f = jnp.asarray(rng.randn(R, S_f, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    print(f"device: {jax.devices()[0]}")
    results = {}

    for mode in ("auto", "off"):
        c = dataclasses.replace(cfg, fused_kernel=mode)

        @jax.jit
        def fwd_query(params, pts_c, pts_f, latents, c=c):
            raw_c = query_points(params, c, pts_c, None, latents,
                                 network="coarse")
            raw_f = query_points(params, c, pts_f, None, latents,
                                 network="fine")
            return raw_c, raw_f

        t = timeit(fwd_query, params, pts_c, pts_f, latents)
        results[f"query_fwd[{mode}]"] = t

        @jax.jit
        def fwdbwd_query(params, pts_c, pts_f, latents, c=c):
            def loss(p):
                raw_c, raw_f = fwd_query.__wrapped__(p, pts_c, pts_f, latents)
                return jnp.sum(raw_c ** 2) + jnp.sum(raw_f ** 2)
            return jax.grad(loss)(params)

        t = timeit(fwdbwd_query, params, pts_c, pts_f, latents)
        results[f"query_fwdbwd[{mode}]"] = t

        @jax.jit
        def render_fwd(params, rays_o, rays_d, latents, key, c=c):
            return render_rays(params, c, rs, rays_o, rays_d, latents,
                               key=key, detailed=True)["rgb_map"]

        t = timeit(render_fwd, params, rays_o, rays_d, latents, key)
        results[f"render_fwd[{mode}]"] = t

        step_fn = make_train_step(c, tc, rs, has_test_split=False,
                                  donate=False)
        from nonrigid_nerf_tpu.data import build_ray_dataset, \
            get_multi_view_mappings
        extras = get_multi_view_mappings(8, "/nonexistent")
        images = rng.rand(8, 48, 64, 3).astype(np.float32)
        poses = np.tile(np.eye(4)[:3][None], (8, 1, 1)).astype(np.float32)
        intr = {i: {"height": 48, "width": 64, "focal_x": 50.0,
                    "focal_y": 50.0, "center_x": 32.0, "center_y": 24.0,
                    "ray_bending_latent_size": 32} for i in range(8)}
        ds = build_ray_dataset(images, poses, intr, extras,
                               np.arange(8), np.array([], np.int64), 1.0, 6.0)
        st = create_train_state(jax.random.PRNGKey(0), c, tc, 8)

        def run_step(st, key):
            return step_fn(st, ds, key)

        t = timeit(run_step, st, key, iters=100)
        results[f"train_step[{mode}]"] = t

    # stage pieces (fused path internals)
    from nonrigid_nerf_tpu.ops.pallas.fused_query import (
        MLP_FWD_BLOCK, N_BEND_W, pack_fused_weights, _mlp_core)
    from nonrigid_nerf_tpu.models.bending import bend_points
    from nonrigid_nerf_tpu.ops.embedding import fourier_embed

    n = R * (S_c + S_f)
    n_pad = -(-n // MLP_FWD_BLOCK) * MLP_FWD_BLOCK
    emb_flat = jnp.asarray(rng.randn(n_pad, 64), jnp.float32)
    mw = pack_fused_weights(params, 10, "coarse")[N_BEND_W:]

    @jax.jit
    def mlp_fwd(emb, mw):
        return _mlp_core(emb, mw, MLP_FWD_BLOCK)

    results["mlp_kernel_fwd(196k)"] = timeit(mlp_fwd, emb_flat, mw)

    @jax.jit
    def mlp_fwdbwd(emb, mw):
        return jax.grad(lambda e, m: jnp.sum(_mlp_core(e, m, MLP_FWD_BLOCK)),
                        argnums=(0, 1))(emb, mw)

    results["mlp_kernel_fwdbwd(196k)"] = timeit(mlp_fwdbwd, emb_flat, mw)

    # XLA MLP on the same 196k pts
    from nonrigid_nerf_tpu.models.nerf import nerf_mlp_apply
    emb63 = emb_flat[:n, :63].reshape(R, S_c + S_f, 63)

    @jax.jit
    def mlp_xla(params, emb63):
        return nerf_mlp_apply(params["coarse"], cfg, emb63, None, None)

    results["mlp_xla_fwd(196k)"] = timeit(mlp_xla, params, emb63)

    @jax.jit
    def mlp_xla_bwd(params, emb63):
        return jax.grad(
            lambda p, e: jnp.sum(nerf_mlp_apply(p["coarse"], cfg, e, None,
                                                None)))(params, emb63)

    results["mlp_xla_fwdbwd(196k)"] = timeit(mlp_xla_bwd, params, emb63)

    # bend+encode stage alone (XLA, as used by the hybrid)
    lat_pp = jnp.broadcast_to(latents[:, None, :], (R, S_c + S_f, 32))
    pts_all = jnp.asarray(rng.randn(R, S_c + S_f, 3), jnp.float32)

    @jax.jit
    def bend_encode(params, pts, lat):
        bent, det = bend_points(params["bender"], pts, lat)
        return fourier_embed(bent, 10), det["unmasked_offsets"]

    results["bend_encode_xla(196k)"] = timeit(bend_encode, params, pts_all,
                                              lat_pp)

    for k, v in sorted(results.items()):
        print(f"{k:32s} {v * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
