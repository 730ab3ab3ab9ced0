"""Data parallelism over the ray axis via shard_map on a device mesh.

TPU-native replacement for the reference's torch.nn.DataParallel
(reference: train.py:140-323): the model is ~1-2 MB of MLP weights, so the
correct layout is replicated parameters + the ray batch sharded over ICI.

Training: each device samples its own ray sub-batch with a device-folded
PRNG key, computes local masked-sum gradients (normalized by the GLOBAL
batch size), and one psum over the 'data' axis yields exactly the
single-device gradient — the TPU analog of DataParallel's gather of per-ray
losses (reference: train.py:287), except the reduction is an ICI collective
instead of a host-side mean. The Adam update then runs identically on every
device, keeping parameters replicated without any broadcast.

Rendering: the flat ray array is sharded over devices; each shard streams
through the block renderer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.data.dataset import RayDataset, sample_ray_batch
from nonrigid_nerf_tpu.engine.losses import per_ray_losses
from nonrigid_nerf_tpu.engine.render import make_ray_renderer, render_rays
from nonrigid_nerf_tpu.engine.train_state import TrainState, make_optimizer
from nonrigid_nerf_tpu.ops.math import mse2psnr

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_parallel_train_step(cfg: ModelConfig, tc: TrainConfig,
                             rs: RenderSettings, mesh: Mesh,
                             has_test_split: bool,
                             n_rand: Optional[int] = None,
                             donate: bool = True,
                             debug_metrics: bool = False):
    """Build the multi-device train step.

    The GLOBAL batch is `n_rand` rays (defaults to tc.N_rand), split evenly
    across the mesh. Returns fn(state, ds, key) -> (state, metrics), with
    state and ds replicated across devices.
    """
    n_rand = n_rand if n_rand is not None else tc.N_rand
    n_dev = mesh.devices.size
    if n_rand % n_dev:
        raise ValueError(f"N_rand={n_rand} not divisible by {n_dev} devices")
    local_rand = n_rand // n_dev
    optimizer = make_optimizer(tc)

    def _local_step(state: TrainState, ds: RayDataset, key):
        my_idx = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, state.step)
        k_batch, k_render, k_loss = jax.random.split(key, 3)

        # topology-invariant batch selection: every device samples the
        # GLOBAL batch with the same key and slices its contiguous shard,
        # so the pixels a training run sees — and hence its loss trajectory
        # — do not depend on the mesh size or process topology (same seed,
        # same run, any number of chips). Sampling n_rand indices is
        # negligible next to the render. The k_batch derivation matches the
        # single-device train_step exactly (engine/train_step.py).
        gbatch = sample_ray_batch(k_batch, ds, n_rand)
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(
                x, my_idx * local_rand, local_rand, 0), gbatch)
        # stratified jitter / density noise / divergence probes stay
        # device-varying (iid per-ray draws; their realization legitimately
        # differs by topology, like dataloader order)
        k_render = jax.random.fold_in(k_render, my_idx)
        k_loss = jax.random.fold_in(k_loss, my_idx)
        needs_detail = cfg.use_ray_bending and (
            tc.offsets_loss_weight > 0.0 or tc.divergence_loss_weight > 0.0)

        def losses_fn(params):
            latents = params["latents"][batch["timestep_ids"]]
            out = render_rays(params, cfg, rs, batch["rays_o"],
                              batch["rays_d"], latents, key=k_render,
                              detailed=needs_detail)
            losses, aux = per_ray_losses(k_loss, params, cfg, tc, out,
                                         batch["target_rgb"], latents,
                                         state.step)
            return losses, aux

        losses, vjp_fn, aux = jax.vjp(losses_fn, state.params, has_aux=True)

        inv_n = 1.0 / float(n_rand)  # global batch normalization
        grads, = vjp_fn(batch["train_indicator"] * inv_n)
        if has_test_split:
            test_grads, = vjp_fn(batch["test_indicator"] * inv_n)
            grads = {**grads,
                     "latents": grads["latents"] + test_grads["latents"]}

        # the one collective: grads ride ICI, params stay replicated
        grads = jax.lax.psum(grads, DATA_AXIS)

        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1)

        train_count = jnp.maximum(
            jax.lax.psum(jnp.sum(batch["train_indicator"]), DATA_AXIS), 1.0)

        def masked_mean(x):
            return jax.lax.psum(jnp.sum(x * batch["train_indicator"]),
                                DATA_AXIS) / train_count

        metrics = {"loss": masked_mean(losses),
                   "psnr": mse2psnr(masked_mean(aux["img_loss"]))}
        for name in ("img_loss", "img_loss0", "offsets_loss",
                     "divergence_loss"):
            if name in aux:
                metrics[name] = masked_mean(aux[name])
        if debug_metrics:
            import optax
            metrics["grad_norm"] = optax.global_norm(grads)  # post-psum
        return new_state, metrics

    sharded = jax.shard_map(
        _local_step, mesh=mesh,
        in_specs=(P(), P(), P()),      # state, dataset, key all replicated
        out_specs=(P(), P()),
        check_vma=False)               # RNG fold makes locals device-varying
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_parallel_renderer(cfg: ModelConfig, rs: RenderSettings, mesh: Mesh,
                           chunk: int = 32768, edit=None,
                           detailed: bool = False, postprocess=None):
    """Multi-device inference: shard the flat ray array over the mesh
    (reference analog: render_wrapper_class, train.py:300-323).

    Returns fn(params, rays_o (N,3), rays_d, latents, key|None) -> dict.
    N is padded to a multiple of devices*chunk by the caller-facing wrapper.
    `detailed`/`postprocess` pass through to the per-device block renderer
    (postprocess runs on-device per block, before the shard_map gather).
    """
    from nonrigid_nerf_tpu.config import EditConfig
    edit = edit if edit is not None else EditConfig()
    n_dev = mesh.devices.size
    block = make_ray_renderer(cfg, rs, edit=edit, chunk=chunk, jit=False,
                              detailed=detailed, postprocess=postprocess)

    def _local(params, rays_o, rays_d, latents, key):
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return block(params, rays_o, rays_d, latents, key)

    sharded = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    sharded = jax.jit(sharded)

    def render_all(params, rays_o, rays_d, latents, key=None):
        n = rays_o.shape[0]
        pad = (-n) % (n_dev * chunk)
        if pad:
            def _pad(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0)
            rays_o, rays_d, latents = map(_pad, (rays_o, rays_d, latents))
        out = sharded(params, rays_o, rays_d, latents, key)
        return jax.tree_util.tree_map(lambda x: x[:n], out)

    return render_all


def make_auto_renderer(cfg: ModelConfig, rs: RenderSettings, edit=None,
                       chunk: int = 32768, detailed: bool = False,
                       postprocess=None, n_rays_hint: Optional[int] = None):
    """Renderer that shards over all visible devices when there is more than
    one, single-device otherwise — the inference analog of the reference's
    optional DataParallel wrap (reference: train.py:320-323). Uniform
    signature: fn(params, rays_o (N,3), rays_d, latents, key=None) -> dict.

    `n_rays_hint` (e.g. H*W) lets the multi-device path shrink its per-device
    chunk so padding to devices*chunk wastes little work.

    Uses LOCAL devices: under multi-host training each process renders its
    own artifacts independently (train.py gates them to process 0), so the
    render mesh must not span processes. Single-process, local == all."""
    from nonrigid_nerf_tpu.config import EditConfig
    edit = edit if edit is not None else EditConfig()
    devices = jax.local_devices()
    if len(devices) > 1:
        if n_rays_hint:
            per_dev = -(-int(n_rays_hint) // len(devices))
            chunk = max(1, min(chunk, per_dev))
        return make_parallel_renderer(cfg, rs, make_mesh(devices),
                                      chunk=chunk, edit=edit,
                                      detailed=detailed,
                                      postprocess=postprocess)
    if n_rays_hint:
        chunk = max(1, min(chunk, int(n_rays_hint)))
    single = make_ray_renderer(cfg, rs, edit=edit, chunk=chunk,
                               detailed=detailed, postprocess=postprocess)

    def render_all(params, rays_o, rays_d, latents, key=None):
        return single(params, rays_o, rays_d, latents, key)

    return render_all
