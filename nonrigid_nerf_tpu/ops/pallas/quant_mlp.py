"""Int8 inference kernel for the canonical NeRF MLP (experimental).

Post-training quantization of the 8x256 canonical MLP for the rendering
path: int8 weights (per-output-channel scales) x int8 activations
(per-layer STATIC scales, calibrated once from a trained checkpoint), so
every 256x256 matmul runs on the v5e MXU's int8 path (2x bf16 peak
throughput). The raw output head stays bf16 from the dequantized last
hidden layer, so density/rgb never quantize.

MEASURED OUTCOME on v5e (idle chip, trained 200k-step checkpoint): quality
parity is excellent — 52.9 dB agreement with the f32 renderer, far beyond
visible — but throughput LOSES: 323k rays/s vs the f32 XLA path's 412k.
The requantization chain (dequant-scale + bias + clip + round + int8 cast
per layer) is VPU work that costs more than the 2x MXU saving at 256-wide
layers, the same failure mode as dynamic per-row quantization (0.96x) and
a folded-multiplier variant (0.86x; see ROADMAP.md negative results). The
path is kept as an opt-in (`fused_kernel="int8"`) because the balance
shifts on parts with a higher MXU:VPU int8 ratio; do not expect a win on
v5e.

Measured design constraints (see ROADMAP.md):
- DYNAMIC per-row activation quantization is a wash (0.96x vs bf16): the
  per-row |max| reduction + rescale per layer costs as much VPU time as the
  MXU saves.
- ReLU activations are non-negative, so symmetric int8 would waste the sign
  bit. Instead hidden activations quantize with zero-point -127
  (q = round(x * 254/s) - 127, clipped to [-127, 127]), and the shift is
  repaired exactly in the integer domain: (q + 127) @ W = q @ W +
  127 * colsum(W), with 127*colsum(qw)*dequant folded into the bias ahead
  of time. The embedding input is sign-symmetric (sin/cos channels), so
  layer 0 and the layer-5 skip use plain symmetric quantization.

Calibration: `calibrate_act_scales` runs the f32 forward on sample
embeddings and records per-layer activation maxima. The scales ride in
`params["quant"]` (an ordinary pytree leaf: checkpointable, donate-able),
and `fused_kernel="int8"` routes `canonical_mlp_stage` here. Inference
only — training never quantizes (`make_train_step` rejects the mode).

Reference behavioral contract: run_nerf_helpers.py:240-314 (the canonical
MLP this approximates); the quality gate is PSNR parity on the FVR
`scores.json` protocol (free_viewpoint_rendering.py:826-876).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nonrigid_nerf_tpu.ops.pallas.fused_query import (
    EMB, NW, OUT_PAD, _io_spec, _mlp_fwd_math, pack_mlp_weights)

N_LAYERS = 8            # hidden layers of the canonical MLP
I8_FWD_BLOCK = 4096     # int8 acts are quarter-width; working set is tiny


def calibrate_act_scales(params, emb_samples, network: str = "coarse",
                         multires: int = 10):
    """Per-layer activation maxima of the canonical MLP on a calibration
    batch of embedded points (n, 63|64). Returns (9,) f32: [s_emb, s1..s8].
    """
    if emb_samples.shape[-1] == 63:
        emb_samples = jnp.pad(emb_samples, ((0, 0), (0, 1)))
    mw = pack_mlp_weights(params, network)
    _, acts = _mlp_fwd_math(emb_samples, mw, return_acts=True)
    order = ["embb", "nh1", "nh2", "nh3", "nh4", "nh5", "nh6", "nh7", "nh8"]
    return jnp.stack([jnp.max(jnp.abs(acts[k].astype(jnp.float32)))
                      for k in order])


def quantize_for_inference(params, cfg, rays_o, rays_d, latents,
                           near: float, far: float, n_rays: int = 512,
                           n_samples: int = 64):
    """Calibrate int8 activation scales on real scene content and return
    params with the `"quant"` leaf set.

    Draws a strided subset of the given rays, samples them stratified
    (deterministic), runs the trained bending field + positional encoding,
    and records per-layer activation maxima of both canonical MLPs on those
    embeddings. Use with `dataclasses.replace(cfg, fused_kernel="int8")`.
    """
    import numpy as np
    from nonrigid_nerf_tpu.engine.query import bend_encode_stage
    from nonrigid_nerf_tpu.ops.sampling import stratified_z_vals

    rays_o = jnp.asarray(np.asarray(rays_o)).reshape(-1, 3)
    rays_d = jnp.asarray(np.asarray(rays_d)).reshape(-1, 3)
    latents = jnp.asarray(np.asarray(latents)).reshape(rays_o.shape[0], -1)
    stride = max(1, rays_o.shape[0] // n_rays)
    rays_o, rays_d = rays_o[::stride][:n_rays], rays_d[::stride][:n_rays]
    lat = latents[::stride][:n_rays]

    z = stratified_z_vals(None, near, far, rays_o.shape[0], n_samples,
                          perturb=0.0)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., :, None]
    st = bend_encode_stage(params, cfg, pts, lat)
    emb = st["embedded"].astype(jnp.float32).reshape(-1, cfg.input_ch)
    return add_quant_scales(params, emb, cfg.multires)


def add_quant_scales(params, emb_samples, multires: int = 10):
    """Return params with a `"quant"` leaf holding, per network, the
    calibration scales AND the prepacked int8 weight tuple (so the rounding
    / clipping / colsum-bias folds run ONCE here, not inside the renderer's
    chunk loop). Idempotent; keeps all other leaves by reference."""
    quant = {}
    for network in ("coarse", "fine"):
        if network in params:
            scales = calibrate_act_scales(
                params, emb_samples, network, multires)
            quant[network] = {
                "scales": scales,
                "packed": pack_int8_mlp_weights(params, scales, network,
                                                multires),
            }
    out = dict(params)
    out["quant"] = quant
    return out


def packed_int8_weights(quant_leaf, params, network: str, multires: int):
    """The kernel weight tuple from a `params["quant"][network]` entry.
    Prefers the prepacked tuple; falls back to on-the-fly packing for old
    entries that stored only the (9,) scales array."""
    if isinstance(quant_leaf, dict) and "packed" in quant_leaf:
        return tuple(quant_leaf["packed"])
    return pack_int8_mlp_weights(params, quant_leaf, network, multires)


# Packed weight tuple layout (all matmul operands int8, per-out-channel
# scales folded with the PREVIOUS layer's activation scale into f32 dequant
# rows; biases absorb the zero-point correction):
#   layer0 (qw0,d0,b0), layers1-4 (qw,d,b)x4, layer5 (qw5h,d5h,b5,qw5e,d5e),
#   layers6-7 (qw,d,b)x2, head (owb bf16, ob), qm (1,16) quant multipliers
N_QW = 28


def pack_int8_mlp_weights(params, scales, network: str = "coarse",
                          multires: int = 10):
    """Quantize a canonical MLP into the int8 kernel's weight tuple.

    scales: (9,) f32 from calibrate_act_scales — [s_emb, s1..s8]. Hidden
    activations l use zero-point -127 over [0, s_l]; the embedding is
    symmetric over [-s_emb, s_emb].
    """
    mw = pack_mlp_weights(params, network)
    (n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b, ow, ob) = mw
    s = [jnp.maximum(scales[i], 1e-8) for i in range(9)]

    def quant_w(w):
        ws = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        ws = jnp.maximum(ws, 1e-12)
        qw = jnp.round(w / ws).astype(jnp.int8)
        return qw, ws

    out = []
    # layer 0: symmetric embedding input, quant step s_emb/127
    qw0, ws0 = quant_w(n0w)
    out += [qw0, (s[0] / 127.0) * ws0, n0b]
    # layers 1..4, 6..7: relu input from layer l-1, zero-point -127,
    # quant step s_{l-1}/254; bias absorbs 127 * colsum(qw) * dequant
    for (w, b), l in (((n1w, n1b), 1), ((n2w, n2b), 2), ((n3w, n3b), 3),
                      ((n4w, n4b), 4)):
        qw, ws = quant_w(w)
        d = (s[l] / 254.0) * ws
        out += [qw, d, b + 127.0 * jnp.sum(qw.astype(jnp.float32),
                                           axis=0, keepdims=True) * d]
    # layer 5 (skip): h-branch from nh5 (zero-point -127) + emb branch
    # (symmetric)
    qw5h, ws5h = quant_w(n5h)
    d5h = (s[5] / 254.0) * ws5h
    qw5e, ws5e = quant_w(n5e)
    d5e = (s[0] / 127.0) * ws5e
    b5 = n5b + 127.0 * jnp.sum(qw5h.astype(jnp.float32), axis=0,
                               keepdims=True) * d5h
    out += [qw5h, d5h, b5, qw5e, d5e]
    for (w, b), l in (((n6w, n6b), 6), ((n7w, n7b), 7)):
        qw, ws = quant_w(w)
        d = (s[l] / 254.0) * ws
        out += [qw, d, b + 127.0 * jnp.sum(qw.astype(jnp.float32),
                                           axis=0, keepdims=True) * d]
    # output head: bf16 on the dequantized last hidden layer
    out += [ow.astype(jnp.bfloat16), ob]
    # quant multipliers as one (1, 16) row: [127/s_emb, 254/s_1..254/s_8]
    qm = jnp.zeros((1, 16), jnp.float32)
    qm = qm.at[0, 0].set(127.0 / s[0])
    for l in range(1, 9):
        qm = qm.at[0, l].set(254.0 / s[l])
    out.append(qm)
    assert len(out) == N_QW + 1
    return tuple(out)


def _mm_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _quant_sym(x, m):
    return jnp.round(jnp.clip(x * m, -127.0, 127.0)).astype(jnp.int8)


def _quant_relu(x, m):
    # x is post-relu (>= 0): zero-point -127 over [0, s]
    return (jnp.round(jnp.clip(x * m, 0.0, 254.0)) - 127.0).astype(jnp.int8)


def _i8_fwd_math(emb, w):
    (qw0, d0, b0, qw1, d1, b1, qw2, d2, b2, qw3, d3, b3, qw4, d4, b4,
     qw5h, d5h, b5, qw5e, d5e, qw6, d6, b6, qw7, d7, b7, owb, ob, qm) = w
    qemb = _quant_sym(emb, qm[0, 0])
    h1 = jax.nn.relu(_mm_i8(qemb, qw0).astype(jnp.float32) * d0 + b0)
    q1 = _quant_relu(h1, qm[0, 1])
    h2 = jax.nn.relu(_mm_i8(q1, qw1).astype(jnp.float32) * d1 + b1)
    q2 = _quant_relu(h2, qm[0, 2])
    h3 = jax.nn.relu(_mm_i8(q2, qw2).astype(jnp.float32) * d2 + b2)
    q3 = _quant_relu(h3, qm[0, 3])
    h4 = jax.nn.relu(_mm_i8(q3, qw3).astype(jnp.float32) * d3 + b3)
    q4 = _quant_relu(h4, qm[0, 4])
    h5 = jax.nn.relu(_mm_i8(q4, qw4).astype(jnp.float32) * d4 + b4)
    q5 = _quant_relu(h5, qm[0, 5])
    h6 = jax.nn.relu(_mm_i8(q5, qw5h).astype(jnp.float32) * d5h
                     + _mm_i8(qemb, qw5e).astype(jnp.float32) * d5e + b5)
    q6 = _quant_relu(h6, qm[0, 6])
    h7 = jax.nn.relu(_mm_i8(q6, qw6).astype(jnp.float32) * d6 + b6)
    q7 = _quant_relu(h7, qm[0, 7])
    h8 = jax.nn.relu(_mm_i8(q7, qw7).astype(jnp.float32) * d7 + b7)
    raw = jax.lax.dot_general(
        h8.astype(jnp.bfloat16), owb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + ob
    return raw


def _i8_fwd_kernel(emb_ref, *rest):
    w = [r[:] for r in rest[:N_QW + 1]]
    rest[N_QW + 1][:] = _i8_fwd_math(emb_ref[:], w)


@functools.partial(jax.jit, static_argnums=(2,))
def mlp_i8_core(emb, qw, block: int = I8_FWD_BLOCK):
    """Int8 canonical-MLP forward. emb: (n, EMB) f32/bf16, n % block == 0.
    Returns raw (n, OUT_PAD) f32."""
    n = emb.shape[0]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in qw]
    return pl.pallas_call(
        _i8_fwd_kernel,
        grid=(n // block,),
        in_specs=[_io_spec(block, EMB)] + w_specs,
        out_specs=_io_spec(block, OUT_PAD),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(emb.astype(jnp.float32), *qw)
