"""Ahead-of-time export of a trained renderer for serving.

Serializes the production inference path — `render_rays` over a fixed-size
ray block, deterministic test-mode settings, weights baked in as constants
— to a portable StableHLO artifact via `jax.export`. The artifact is
self-contained: one `.stablehlo` file (graph + weights) plus a JSON sidecar
with the calling convention and the per-timestep latent table. A serving
process needs only `jax` to run it — none of this package, no checkpoint
files, no config system:

    from nonrigid_nerf_tpu.serving import load_exported
    render, meta = load_exported("model.stablehlo")
    out = render(rays_o, rays_d, latents)        # each (chunk, 3/L)

The exported graph uses the XLA MLP path (`fused_kernel="off"`): it is the
production inference default anyway (measured faster forward-only than the
Pallas kernel, see engine/render.py) and keeps the artifact free of
TPU-only custom calls, so one export can carry both 'tpu' and 'cpu'
lowerings.

The reference has no deployment story beyond "run the repo"
(free_viewpoint_rendering.py is a research CLI importing the training
snapshot); this is the TPU-native serving analog.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from nonrigid_nerf_tpu.config import EditConfig, ModelConfig, RenderSettings


def make_serving_fn(params, cfg: ModelConfig, rs: RenderSettings,
                    edit: EditConfig = EditConfig()):
    """The pure block-renderer the artifact wraps: weights closed over,
    deterministic (key=None), compact per-ray outputs only."""
    from nonrigid_nerf_tpu.engine.render import render_rays

    if cfg.fused_kernel != "off":
        cfg = dataclasses.replace(cfg, fused_kernel="off")
    rs = rs.test_mode()

    def fn(rays_o, rays_d, latents):
        out = render_rays(params, cfg, rs, rays_o, rays_d, latents,
                          key=None, edit=edit)
        return {"rgb_map": out["rgb_map"], "disp_map": out["disp_map"],
                "acc_map": out["acc_map"]}

    return fn


def export_renderer(params, cfg: ModelConfig, rs: RenderSettings,
                    chunk: int = 32768,
                    platforms: Optional[Sequence[str]] = None,
                    edit: EditConfig = EditConfig(),
                    extra_meta: Optional[dict] = None) -> Tuple[bytes, dict]:
    """Serialize the renderer. Returns (stablehlo_bytes, meta_dict).

    `platforms`: lowering targets, e.g. ("cpu", "tpu"); defaults to the
    current backend. Rays are a FIXED (chunk, 3) block — serving callers
    pad the tail block (acc_map tells real rays from padding if needed).
    """
    import jax
    from jax import export as jax_export

    fn = make_serving_fn(params, cfg, rs, edit)
    latent_size = int(np.asarray(params["latents"]).shape[-1])
    f32 = np.float32
    specs = (jax.ShapeDtypeStruct((chunk, 3), f32),
             jax.ShapeDtypeStruct((chunk, 3), f32),
             jax.ShapeDtypeStruct((chunk, latent_size), f32))
    exported = jax_export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None)(*specs)

    meta = {
        "format": "nonrigid_nerf_tpu.serving/1",
        "chunk": int(chunk),
        "latent_size": latent_size,
        "platforms": list(exported.platforms),
        "inputs": ["rays_o (chunk, 3) f32", "rays_d (chunk, 3) f32",
                   "latents (chunk, latent_size) f32"],
        "outputs": ["rgb_map (chunk, 3)", "disp_map (chunk,)",
                    "acc_map (chunk,)"],
        "near": float(rs.near),
        "far": float(rs.far),
        # per-timestep latent table so a client can render "frame t"
        # without any other file
        "latent_table": np.asarray(params["latents"],
                                   np.float32).tolist(),
    }
    if extra_meta:
        meta.update(extra_meta)
    return exported.serialize(), meta


def save_exported(path: str, blob: bytes, meta: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_exported(path: str):
    """Deserialize an artifact. Returns (render_fn, meta); render_fn takes
    (rays_o, rays_d, latents) arrays of the exported block shape."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return exported.call, meta


def render_many(render_fn, chunk: int, rays_o, rays_d, latents):
    """Client-side convenience: drive a fixed-block artifact over
    arbitrarily many rays (pad the tail block, strip the padding)."""
    n = rays_o.shape[0]
    pad = (-n) % chunk
    if pad:
        rays_o = np.concatenate([rays_o, np.zeros((pad, 3), rays_o.dtype)])
        rays_d = np.concatenate(
            [rays_d, np.tile(np.asarray([[0, 0, -1]], rays_d.dtype),
                             (pad, 1))])
        latents = np.concatenate(
            [latents, np.zeros((pad, latents.shape[1]), latents.dtype)])
    outs = [render_fn(rays_o[i:i + chunk], rays_d[i:i + chunk],
                      latents[i:i + chunk])
            for i in range(0, n + pad, chunk)]
    return {k: np.concatenate([np.asarray(o[k]) for o in outs])[:n]
            for k in outs[0]}
