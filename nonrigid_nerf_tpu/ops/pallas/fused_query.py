"""Pallas TPU kernel: the fused NR-NeRF point-query chain.

One kernel evaluates, per block of sample points, the ENTIRE inner hot loop
(reference: NeRF.forward + ray_bending.forward,
run_nerf_helpers.py:240-314,507-584):

    bend MLP -> rigidity MLP -> bent points -> positional encoding ->
    canonical NeRF MLP (8x256, skip at 4) -> raw (rgb, density)

with every weight matrix resident in VMEM and NO intermediate activation
ever written to HBM. The XLA version of this chain is HBM-bandwidth-bound
(each 256-wide activation round-trips HBM between layers); here HBM traffic
is just points + latents in, raw/offsets/rigidity out.

Tricks:
- lane-concat avoidance: every concat in the reference (pts||latent at the
  bender input, skip concat at NeRF layer 4) becomes a SPLIT weight matrix:
  concat(a, b) @ W == a @ W_a + b @ W_b.
- positional encoding as one matmul: sin(bent @ P + phase), where P routes
  coordinate j to channel c with gain 2^k and the phase selects sin/cos
  (cos x = sin(x + pi/2)); the raw-xyz channels are selected by a lane mask.
- backward (custom VJP) recomputes the forward inside VMEM per block
  (flash-attention style); weight gradients accumulate in the f32 output
  block, which stays VMEM-resident across the sequential TPU grid.

Matmuls run in bf16 on the MXU with f32 accumulation (weights are stored
f32 and cast in-kernel, so parameter gradients keep full precision); the
positional encoding and all outputs stay f32 (sin of 2^9-scaled coordinates
needs f32 mantissa).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fixed architecture constants (the flagship config; see supports_fused_query)
PTS_PAD = 8          # xyz padded to 8 lanes
LAT = 32             # ray-bending latent size
BW = 64              # bending hidden width
RW = 32              # rigidity hidden width
EMB = 64             # 63 encoding channels padded to 64
NW = 256             # canonical MLP width
OUT_PAD = 8          # raw output (4 channels consumed) padded to 8
DEFAULT_BLOCK = 1024
N_WEIGHTS = 37


def supports_fused_query(cfg) -> bool:
    """Whether the ENGINE's hybrid fused path (XLA bend/encode + Pallas MLP
    kernel) covers this architecture.

    Only canonical-MLP conditions matter: the deformation field runs in XLA
    regardless (any bending depth/width/activation, rigidity on or off, or
    NO bending at all — plain NeRF — all route through the MLP kernel).
    View directions are supported (_mlpv_core grows the
    alpha/feature/views/rgb heads); the direction computation itself stays
    in XLA. The time-conditioned baseline concatenates the latent into the
    MLP input — the kernel pads the 63+latent channels to 128 lanes
    (no-viewdirs only; the viewdirs weight packing still assumes the
    63-channel input).

    The MONOLITHIC kernels (fused_point_query[_split]) additionally assume
    the flagship bending architecture (depth 5 x 64, rigidity 3 x 32,
    latent 32, relu); they are exported for benchmarking, not used by the
    engine."""
    return ((not cfg.use_viewdirs or cfg.multires_views == 4)
            and (not cfg.time_conditioned_baseline
                 or (not cfg.use_viewdirs
                     and 63 + cfg.ray_bending_latent_size <= 128))
            and cfg.i_embed == 0
            and cfg.multires == 10
            and cfg.netdepth == 8 and cfg.netwidth == NW
            # the fine pass routes through the same kernel/weight packing,
            # so a non-default fine architecture must fall back to XLA
            and (cfg.N_importance <= 0
                 or (cfg.netdepth_fine == 8 and cfg.netwidth_fine == NW))
            and tuple(cfg.skips) == (4,))


def _embedding_projection(multires: int = 10):
    """P (PTS_PAD, EMB) and phase (EMB,) such that the reference encoding
    [x, y, z, sin(2^k x..z), cos(2^k x..z), ...] equals
    where(lane < 3, pre, sin(pre + phase)) with pre = pts_pad @ P."""
    P = np.zeros((PTS_PAD, EMB), np.float32)
    phase = np.zeros((EMB,), np.float32)
    for j in range(3):
        P[j, j] = 1.0
    c = 3
    for k in range(multires):
        for is_cos in (0, 1):
            for j in range(3):
                P[j, c] = 2.0 ** k
                phase[c] = (np.pi / 2.0) if is_cos else 0.0
                c += 1
    assert c == 63
    return P, phase


def _pad_w(w, rows, cols):
    out = jnp.zeros((rows, cols), jnp.float32)
    return out.at[:w.shape[0], :w.shape[1]].set(w)


def _pad_b(b, cols):
    out = jnp.zeros((1, cols), jnp.float32)
    return out.at[0, :b.shape[0]].set(b)


def pad_lanes(n_ch: int) -> int:
    """Input channels padded to a lane-friendly width (multiple of 64)."""
    return -(-n_ch // 64) * 64


def pack_mlp_weights(params, network: str = "coarse", in_ch: int = 63):
    """MLP-only weight tuple (== the [N_BEND_W:] slice of
    pack_fused_weights): the canonical 8x256 chain + raw output head. No
    bender required — this is what the hybrid engine path consumes, so it
    also serves plain-NeRF (ray_bending=None) models.

    in_ch: raw MLP input channels BEFORE padding — 63 for the fourier
    encoding, 63 + latent_size for the time-conditioned baseline (the
    latent is concatenated into the input, reference
    run_nerf_helpers.py:207-209). Padded to a multiple of 64 lanes."""
    pts_layers = params[network]["pts"]
    out_layer = params[network]["output"]
    emb_pad = pad_lanes(in_ch)
    ws = [
        _pad_w(pts_layers[0]["w"], emb_pad, NW),      # n0_w
        _pad_b(pts_layers[0]["b"], NW),
    ]
    for i in (1, 2, 3, 4):
        ws += [pts_layers[i]["w"], _pad_b(pts_layers[i]["b"], NW)]
    # skip layer 5: input is concat([mlp_input(in_ch), hidden(256)]) ->
    # rows 0..in_ch-1 are the input part, in_ch.. the hidden part
    w5 = pts_layers[5]["w"]
    ws += [
        _pad_w(w5[:in_ch], emb_pad, NW),              # n5_e
        w5[in_ch:],                                   # n5_h (NW, NW)
        _pad_b(pts_layers[5]["b"], NW),
    ]
    for i in (6, 7):
        ws += [pts_layers[i]["w"], _pad_b(pts_layers[i]["b"], NW)]
    ws += [
        _pad_w(out_layer["w"][:, :4], NW, OUT_PAD),   # out_w
        _pad_b(out_layer["b"][:4], OUT_PAD),
    ]
    return tuple(ws)


def pack_fused_weights(params, multires: int = 10, network: str = "coarse"):
    """Flatten the model pytree into the monolithic kernel's padded f32
    weight tuple (bend + rigidity + embedding projection + MLP). See
    _forward_math for the unpack order."""
    bend = params["bender"]["bend"]
    rig = params["bender"]["rigidity"]

    P, phase = _embedding_projection(multires)

    ws = [
        _pad_w(bend[0]["w"][:3], PTS_PAD, BW),        # 0 bend0_p
        bend[0]["w"][3:],                             # 1 bend0_l (LAT, BW)
        _pad_b(bend[0]["b"], BW),                     # 2
        bend[1]["w"], _pad_b(bend[1]["b"], BW),       # 3,4
        bend[2]["w"], _pad_b(bend[2]["b"], BW),       # 5,6
        bend[3]["w"], _pad_b(bend[3]["b"], BW),       # 7,8
        _pad_w(bend[4]["w"], BW, PTS_PAD),            # 9 bendo_w (no bias)
        _pad_w(rig[0]["w"][:3], PTS_PAD, RW),         # 10
        _pad_b(rig[0]["b"], RW),                      # 11
        rig[1]["w"], _pad_b(rig[1]["b"], RW),         # 12,13
        _pad_w(rig[2]["w"], RW, PTS_PAD),             # 14
        _pad_b(rig[2]["b"], PTS_PAD),                 # 15
        jnp.asarray(P),                               # 16
        jnp.asarray(phase).reshape(1, EMB),           # 17
    ]
    ws += list(pack_mlp_weights(params, network))     # 18..36
    assert len(ws) == N_WEIGHTS
    return tuple(ws)


def _mm(a, b):
    """bf16 MXU matmul with f32 accumulation (weights cast in place)."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _cast_matmul_weights(ws, f32_only=()):
    """Pre-cast matmul weights to bf16 ONCE in XLA, outside the kernel.

    Inside the kernel every grid step would otherwise re-cast (and re-tile)
    ~2 MB of f32 weights on the VPU — measured as a large fraction of the
    forward's runtime. Biases (row-dim 1, added into f32 accumulators) and
    explicitly-f32 entries (the encoding projection P / phase, which feed a
    HIGHEST-precision dot) keep f32. Numerics are unchanged: the kernel cast
    the same arrays to bf16 anyway."""
    out = []
    for i, w in enumerate(ws):
        if i in f32_only or w.shape[0] == 1:
            out.append(w)
        else:
            out.append(w.astype(jnp.bfloat16))
    return tuple(out)


def _embed(bent, P, phase):
    pre = jnp.dot(bent, P, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    lane = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    emb = jnp.where(lane < 3, pre, jnp.sin(pre + phase))
    return pre, lane, emb


def _forward_math(pts, lat, w, return_acts: bool = False):
    """The fused chain on VMEM-resident values. pts (B, PTS_PAD) f32,
    lat (B, LAT) f32."""
    (b0p, b0l, b0b, b1w, b1b, b2w, b2b, b3w, b3b, bow,
     r0w, r0b, r1w, r1b, row, rob, P, phase,
     n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b, ow, ob) = w
    bf16 = jnp.bfloat16

    bh0 = jax.nn.relu(_mm(pts, b0p) + _mm(lat, b0l) + b0b).astype(bf16)
    bh1 = jax.nn.relu(_mm(bh0, b1w) + b1b).astype(bf16)
    bh2 = jax.nn.relu(_mm(bh1, b2w) + b2b).astype(bf16)
    bh3 = jax.nn.relu(_mm(bh2, b3w) + b3b).astype(bf16)
    offsets = _mm(bh3, bow)                                # (B, PTS_PAD) f32

    rh0 = jax.nn.relu(_mm(pts, r0w) + r0b).astype(bf16)
    rh1 = jax.nn.relu(_mm(rh0, r1w) + r1b).astype(bf16)
    rig_raw = _mm(rh1, row) + rob
    tanh_rr = jnp.tanh(rig_raw)
    rigidity = (tanh_rr + 1.0) * 0.5
    rig0 = rigidity[:, 0:1]

    bent = pts + rig0 * offsets                 # padded lanes stay zero
    pre, lane, emb = _embed(bent, P, phase)
    embb = emb.astype(bf16)

    nh1 = jax.nn.relu(_mm(embb, n0w) + n0b).astype(bf16)
    nh2 = jax.nn.relu(_mm(nh1, n1w) + n1b).astype(bf16)
    nh3 = jax.nn.relu(_mm(nh2, n2w) + n2b).astype(bf16)
    nh4 = jax.nn.relu(_mm(nh3, n3w) + n3b).astype(bf16)
    nh5 = jax.nn.relu(_mm(nh4, n4w) + n4b).astype(bf16)
    nh6 = jax.nn.relu(_mm(nh5, n5h) + _mm(embb, n5e) + n5b).astype(bf16)
    nh7 = jax.nn.relu(_mm(nh6, n6w) + n6b).astype(bf16)
    nh8 = jax.nn.relu(_mm(nh7, n7w) + n7b).astype(bf16)
    raw = _mm(nh8, ow) + ob                                # (B, OUT_PAD) f32

    if not return_acts:
        return raw, offsets, rigidity
    acts = dict(bh0=bh0, bh1=bh1, bh2=bh2, bh3=bh3, rh0=rh0, rh1=rh1,
                tanh_rr=tanh_rr, rig0=rig0, offsets=offsets, pre=pre,
                lane=lane, embb=embb, nh1=nh1, nh2=nh2, nh3=nh3, nh4=nh4,
                nh5=nh5, nh6=nh6, nh7=nh7, nh8=nh8)
    return raw, offsets, rigidity, acts


def _fwd_kernel(pts_ref, lat_ref, *rest):
    w = [r[:] for r in rest[:N_WEIGHTS]]
    raw_ref, off_ref, rig_ref = rest[N_WEIGHTS:]
    raw, off, rig = _forward_math(pts_ref[:], lat_ref[:], w)
    raw_ref[:] = raw
    off_ref[:] = off
    rig_ref[:] = rig


def _io_spec(block, cols):
    return pl.BlockSpec((block, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


_P_PHASE_IDX = (16,)   # the f32 encoding projection in the full weight tuple


def _fwd_pallas(pts_pad, lat, weights, block: int):
    weights = _cast_matmul_weights(weights, f32_only=_P_PHASE_IDX)
    n = pts_pad.shape[0]
    grid = n // block
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    flops_per_pt = 2 * (PTS_PAD * BW + LAT * BW + 3 * BW * BW + BW * PTS_PAD
                        + PTS_PAD * RW + RW * RW + RW * PTS_PAD
                        + PTS_PAD * EMB + 2 * EMB * NW + 7 * NW * NW
                        + NW * OUT_PAD)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + w_specs,
        out_specs=[_io_spec(block, OUT_PAD), _io_spec(block, PTS_PAD),
                   _io_spec(block, PTS_PAD)],
        out_shape=[
            jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
            jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32),
            jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * n,
            bytes_accessed=n * (PTS_PAD + LAT + OUT_PAD + 2 * PTS_PAD) * 4,
            transcendentals=n * (EMB + PTS_PAD)),
    )(pts_pad, lat, *weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(pts_pad, lat, weights, block):
    return _fwd_pallas(pts_pad, lat, weights, block)


def _fused_core_fwd(pts_pad, lat, weights, block):
    out = _fwd_pallas(pts_pad, lat, weights, block)
    return out, (pts_pad, lat, weights)


def _bwd_kernel(pts_ref, lat_ref, *rest):
    """Recompute the forward in VMEM, then backprop the whole chain.
    Weight-gradient output blocks have a constant index map, so they stay
    VMEM-resident across the sequential grid and act as f32 accumulators."""
    w_refs = rest[:N_WEIGHTS]
    draw_ref, doff_ref, drig_ref = rest[N_WEIGHTS:N_WEIGHTS + 3]
    dpts_ref, dlat_ref = rest[N_WEIGHTS + 3:N_WEIGHTS + 5]
    dw_refs = rest[N_WEIGHTS + 5:]
    assert len(dw_refs) == N_WEIGHTS

    w = [r[:] for r in w_refs]
    (b0p, b0l, b0b, b1w, b1b, b2w, b2b, b3w, b3b, bow,
     r0w, r0b, r1w, r1b, row, rob, P, phase,
     n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b, ow, ob) = w
    bf16 = jnp.bfloat16
    pts = pts_ref[:]
    lat = lat_ref[:]

    _, offsets, _, a = _forward_math(pts, lat, w, return_acts=True)

    draw = draw_ref[:]
    drawb = draw.astype(bf16)

    def mmT_nt(x, wt):   # x (B, n) @ wt (m, n)^T -> (B, m), f32 accum
        return jax.lax.dot_general(
            x.astype(bf16), wt.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmT_tn(act, g):  # act (B, m)^T @ g (B, n) -> (m, n), f32 accum
        return jax.lax.dot_general(
            act.astype(bf16), g.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bsum(g):
        return jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    g_ow = mmT_tn(a["nh8"], drawb)
    g_ob = bsum(draw)
    dh8 = (mmT_nt(drawb, ow) * (a["nh8"].astype(jnp.float32) > 0)).astype(bf16)

    g_n7w = mmT_tn(a["nh7"], dh8)
    g_n7b = bsum(dh8)
    dh7 = (mmT_nt(dh8, n7w) * (a["nh7"].astype(jnp.float32) > 0)).astype(bf16)

    g_n6w = mmT_tn(a["nh6"], dh7)
    g_n6b = bsum(dh7)
    dh6 = (mmT_nt(dh7, n6w) * (a["nh6"].astype(jnp.float32) > 0)).astype(bf16)

    g_n5h = mmT_tn(a["nh5"], dh6)
    g_n5e = mmT_tn(a["embb"], dh6)
    g_n5b = bsum(dh6)
    demb = mmT_nt(dh6, n5e)
    dh5 = (mmT_nt(dh6, n5h) * (a["nh5"].astype(jnp.float32) > 0)).astype(bf16)

    g_n4w = mmT_tn(a["nh4"], dh5)
    g_n4b = bsum(dh5)
    dh4 = (mmT_nt(dh5, n4w) * (a["nh4"].astype(jnp.float32) > 0)).astype(bf16)

    g_n3w = mmT_tn(a["nh3"], dh4)
    g_n3b = bsum(dh4)
    dh3 = (mmT_nt(dh4, n3w) * (a["nh3"].astype(jnp.float32) > 0)).astype(bf16)

    g_n2w = mmT_tn(a["nh2"], dh3)
    g_n2b = bsum(dh3)
    dh2 = (mmT_nt(dh3, n2w) * (a["nh2"].astype(jnp.float32) > 0)).astype(bf16)

    g_n1w = mmT_tn(a["nh1"], dh2)
    g_n1b = bsum(dh2)
    dh1 = (mmT_nt(dh2, n1w) * (a["nh1"].astype(jnp.float32) > 0)).astype(bf16)

    g_n0w = mmT_tn(a["embb"], dh1)
    g_n0b = bsum(dh1)
    demb = demb + mmT_nt(dh1, n0w)

    # back through the encoding
    dpre = jnp.where(a["lane"] < 3, demb,
                     demb * jnp.cos(a["pre"] + phase))
    dbent = jnp.dot(dpre, P.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

    # bent = pts + rig0 * offsets, plus direct cotangents on the extra
    # outputs (offsets loss consumes unmasked offsets + rigidity)
    doff_total = dbent * a["rig0"] + doff_ref[:]
    drig0 = jnp.sum(dbent * offsets, axis=1, keepdims=True)   # (B, 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, drig_ref.shape, 1)
    drig = drig_ref[:] + jnp.where(lane8 == 0, drig0, 0.0)
    drig_raw = drig * 0.5 * (1.0 - a["tanh_rr"] * a["tanh_rr"])

    g_row = mmT_tn(a["rh1"], drig_raw)
    g_rob = bsum(drig_raw)
    drh1 = (mmT_nt(drig_raw, row) * (a["rh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_r1w = mmT_tn(a["rh0"], drh1)
    g_r1b = bsum(drh1)
    drh0 = (mmT_nt(drh1, r1w) * (a["rh0"].astype(jnp.float32) > 0)).astype(bf16)
    g_r0w = mmT_tn(pts, drh0)
    g_r0b = bsum(drh0)
    dpts_rig = mmT_nt(drh0, r0w)

    g_bow = mmT_tn(a["bh3"], doff_total)
    dbh3 = (mmT_nt(doff_total, bow) * (a["bh3"].astype(jnp.float32) > 0)).astype(bf16)
    g_b3w = mmT_tn(a["bh2"], dbh3)
    g_b3b = bsum(dbh3)
    dbh2 = (mmT_nt(dbh3, b3w) * (a["bh2"].astype(jnp.float32) > 0)).astype(bf16)
    g_b2w = mmT_tn(a["bh1"], dbh2)
    g_b2b = bsum(dbh2)
    dbh1 = (mmT_nt(dbh2, b2w) * (a["bh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_b1w = mmT_tn(a["bh0"], dbh1)
    g_b1b = bsum(dbh1)
    dbh0 = (mmT_nt(dbh1, b1w) * (a["bh0"].astype(jnp.float32) > 0)).astype(bf16)
    g_b0p = mmT_tn(pts, dbh0)
    g_b0l = mmT_tn(lat, dbh0)
    g_b0b = bsum(dbh0)
    dpts_bend = mmT_nt(dbh0, b0p)
    dlat = mmT_nt(dbh0, b0l)

    dpts_ref[:] = dbent + dpts_rig + dpts_bend
    dlat_ref[:] = dlat

    grads = [g_b0p, g_b0l, g_b0b, g_b1w, g_b1b, g_b2w, g_b2b, g_b3w, g_b3b,
             g_bow, g_r0w, g_r0b, g_r1w, g_r1b, g_row, g_rob,
             jnp.zeros_like(P), jnp.zeros_like(phase),
             g_n0w, g_n0b, g_n1w, g_n1b, g_n2w, g_n2b, g_n3w, g_n3b,
             g_n4w, g_n4b, g_n5e, g_n5h, g_n5b, g_n6w, g_n6b, g_n7w, g_n7b,
             g_ow, g_ob]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for dw, g in zip(dw_refs, grads):
            dw[:] = g

    @pl.when(i > 0)
    def _accum():
        for dw, g in zip(dw_refs, grads):
            dw[:] = dw[:] + g


BWD_BLOCK = 512   # backward holds acts + weights + weight-grad accumulators
                  # in VMEM simultaneously; 1024-pt blocks exceed the 16 MB
                  # VMEM budget (measured: 512 fits, 26.4 MB at 1024)


def _fused_core_bwd(block, residuals, cotangents):
    pts_pad, lat, weights = residuals
    draw, doff, drig = cotangents
    n = pts_pad.shape[0]
    block = min(block, BWD_BLOCK)
    grid = n // block

    # dw outputs keep the f32 shapes/dtypes of the original weights; only
    # the kernel's matmul copies are bf16
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in weights]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    weights = _cast_matmul_weights(weights, f32_only=_P_PHASE_IDX)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    out = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=([_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + w_specs
                  + [_io_spec(block, OUT_PAD), _io_spec(block, PTS_PAD),
                     _io_spec(block, PTS_PAD)]),
        out_specs=[_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32),
                    jax.ShapeDtypeStruct((n, LAT), jnp.float32)]
                   + dw_shapes),
        # 512-pt blocks sit right at the default 16 MB scoped-VMEM budget
        # (surrounding fusions can push it ~50 KB over); give headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(pts_pad, lat, *weights, draw, doff, drig)

    return out[0], out[1], tuple(out[2:])


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# Two-kernel variant: a small bend+rigidity+encoding kernel feeding an
# MLP-only kernel. The split lets the MLP backward (the FLOP bulk) run with
# 1024-pt blocks — it no longer shares VMEM with the bender weights/grads —
# and costs only one (n, EMB) f32 HBM hop between the kernels.
# ---------------------------------------------------------------------------

N_BEND_W = 18   # weights[:18]  = bend + rigidity + P/phase
N_MLP_W = 19    # weights[18:]  = canonical MLP + output head


def _bend_fwd_math(pts, lat, w):
    (b0p, b0l, b0b, b1w, b1b, b2w, b2b, b3w, b3b, bow,
     r0w, r0b, r1w, r1b, row, rob, P, phase) = w
    bf16 = jnp.bfloat16
    bh0 = jax.nn.relu(_mm(pts, b0p) + _mm(lat, b0l) + b0b).astype(bf16)
    bh1 = jax.nn.relu(_mm(bh0, b1w) + b1b).astype(bf16)
    bh2 = jax.nn.relu(_mm(bh1, b2w) + b2b).astype(bf16)
    bh3 = jax.nn.relu(_mm(bh2, b3w) + b3b).astype(bf16)
    offsets = _mm(bh3, bow)
    rh0 = jax.nn.relu(_mm(pts, r0w) + r0b).astype(bf16)
    rh1 = jax.nn.relu(_mm(rh0, r1w) + r1b).astype(bf16)
    rig_raw = _mm(rh1, row) + rob
    tanh_rr = jnp.tanh(rig_raw)
    rigidity = (tanh_rr + 1.0) * 0.5
    rig0 = rigidity[:, 0:1]
    bent = pts + rig0 * offsets
    pre, lane, emb = _embed(bent, P, phase)
    acts = dict(bh0=bh0, bh1=bh1, bh2=bh2, bh3=bh3, rh0=rh0, rh1=rh1,
                tanh_rr=tanh_rr, rig0=rig0, pre=pre, lane=lane)
    return emb, offsets, rigidity, acts


def _bend_fwd_kernel(pts_ref, lat_ref, *rest):
    w = [r[:] for r in rest[:N_BEND_W]]
    emb_ref, off_ref, rig_ref = rest[N_BEND_W:]
    emb, off, rig, _ = _bend_fwd_math(pts_ref[:], lat_ref[:], w)
    emb_ref[:] = emb
    off_ref[:] = off
    rig_ref[:] = rig


def _bend_bwd_kernel(pts_ref, lat_ref, *rest):
    w = [r[:] for r in rest[:N_BEND_W]]
    demb_ref, doff_ref, drig_ref = rest[N_BEND_W:N_BEND_W + 3]
    dpts_ref, dlat_ref = rest[N_BEND_W + 3:N_BEND_W + 5]
    dw_refs = rest[N_BEND_W + 5:]
    (b0p, b0l, b0b, b1w, b1b, b2w, b2b, b3w, b3b, bow,
     r0w, r0b, r1w, r1b, row, rob, P, phase) = w
    bf16 = jnp.bfloat16
    pts, lat = pts_ref[:], lat_ref[:]
    _, offsets, _, a = _bend_fwd_math(pts, lat, w)

    def mmT_nt(x, wt):
        return jax.lax.dot_general(
            x.astype(bf16), wt.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmT_tn(act, g):
        return jax.lax.dot_general(
            act.astype(bf16), g.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bsum(g):
        return jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    demb = demb_ref[:]
    dpre = jnp.where(a["lane"] < 3, demb,
                     demb * jnp.cos(a["pre"] + phase))
    dbent = jnp.dot(dpre, P.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

    doff_total = dbent * a["rig0"] + doff_ref[:]
    drig0 = jnp.sum(dbent * offsets, axis=1, keepdims=True)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, drig_ref.shape, 1)
    drig = drig_ref[:] + jnp.where(lane8 == 0, drig0, 0.0)
    drig_raw = drig * 0.5 * (1.0 - a["tanh_rr"] * a["tanh_rr"])

    g_row = mmT_tn(a["rh1"], drig_raw)
    g_rob = bsum(drig_raw)
    drh1 = (mmT_nt(drig_raw, row)
            * (a["rh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_r1w = mmT_tn(a["rh0"], drh1)
    g_r1b = bsum(drh1)
    drh0 = (mmT_nt(drh1, r1w)
            * (a["rh0"].astype(jnp.float32) > 0)).astype(bf16)
    g_r0w = mmT_tn(pts, drh0)
    g_r0b = bsum(drh0)
    dpts_rig = mmT_nt(drh0, r0w)

    g_bow = mmT_tn(a["bh3"], doff_total)
    dbh3 = (mmT_nt(doff_total, bow)
            * (a["bh3"].astype(jnp.float32) > 0)).astype(bf16)
    g_b3w = mmT_tn(a["bh2"], dbh3)
    g_b3b = bsum(dbh3)
    dbh2 = (mmT_nt(dbh3, b3w)
            * (a["bh2"].astype(jnp.float32) > 0)).astype(bf16)
    g_b2w = mmT_tn(a["bh1"], dbh2)
    g_b2b = bsum(dbh2)
    dbh1 = (mmT_nt(dbh2, b2w)
            * (a["bh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_b1w = mmT_tn(a["bh0"], dbh1)
    g_b1b = bsum(dbh1)
    dbh0 = (mmT_nt(dbh1, b1w)
            * (a["bh0"].astype(jnp.float32) > 0)).astype(bf16)
    g_b0p = mmT_tn(pts, dbh0)
    g_b0l = mmT_tn(lat, dbh0)
    g_b0b = bsum(dbh0)

    dpts_ref[:] = dbent + dpts_rig + mmT_nt(dbh0, b0p)
    dlat_ref[:] = mmT_nt(dbh0, b0l)

    grads = [g_b0p, g_b0l, g_b0b, g_b1w, g_b1b, g_b2w, g_b2b, g_b3w, g_b3b,
             g_bow, g_r0w, g_r0b, g_r1w, g_r1b, g_row, g_rob,
             jnp.zeros_like(P), jnp.zeros_like(phase)]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for dw, g in zip(dw_refs, grads):
            dw[:] = g

    @pl.when(i > 0)
    def _accum():
        for dw, g in zip(dw_refs, grads):
            dw[:] = dw[:] + g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bend_core(pts_pad, lat, bw, block):
    n = pts_pad.shape[0]
    bw = _cast_matmul_weights(bw, f32_only=_P_PHASE_IDX)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in bw]
    return pl.pallas_call(
        _bend_fwd_kernel,
        grid=(n // block,),
        in_specs=[_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + w_specs,
        out_specs=[_io_spec(block, EMB), _io_spec(block, PTS_PAD),
                   _io_spec(block, PTS_PAD)],
        out_shape=[jax.ShapeDtypeStruct((n, EMB), jnp.float32),
                   jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32)],
    )(pts_pad, lat, *bw)


def _bend_core_fwd(pts_pad, lat, bw, block):
    return _bend_core(pts_pad, lat, bw, block), (pts_pad, lat, bw)


def _bend_core_bwd(block, residuals, cots):
    pts_pad, lat, bw = residuals
    demb, doff, drig = cots
    n = pts_pad.shape[0]
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in bw]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in bw]
    bw = _cast_matmul_weights(bw, f32_only=_P_PHASE_IDX)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in bw]
    out = pl.pallas_call(
        _bend_bwd_kernel,
        grid=(n // block,),
        in_specs=([_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + w_specs
                  + [_io_spec(block, EMB), _io_spec(block, PTS_PAD),
                     _io_spec(block, PTS_PAD)]),
        out_specs=[_io_spec(block, PTS_PAD), _io_spec(block, LAT)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32),
                    jax.ShapeDtypeStruct((n, LAT), jnp.float32)]
                   + dw_shapes),
    )(pts_pad, lat, *bw, demb, doff, drig)
    return out[0], out[1], tuple(out[2:])


_bend_core.defvjp(_bend_core_fwd, _bend_core_bwd)


def _mlp_fwd_math(emb, w, return_acts=False):
    (n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b, ow, ob) = w
    bf16 = jnp.bfloat16
    embb = emb.astype(bf16)
    nh1 = jax.nn.relu(_mm(embb, n0w) + n0b).astype(bf16)
    nh2 = jax.nn.relu(_mm(nh1, n1w) + n1b).astype(bf16)
    nh3 = jax.nn.relu(_mm(nh2, n2w) + n2b).astype(bf16)
    nh4 = jax.nn.relu(_mm(nh3, n3w) + n3b).astype(bf16)
    nh5 = jax.nn.relu(_mm(nh4, n4w) + n4b).astype(bf16)
    nh6 = jax.nn.relu(_mm(nh5, n5h) + _mm(embb, n5e) + n5b).astype(bf16)
    nh7 = jax.nn.relu(_mm(nh6, n6w) + n6b).astype(bf16)
    nh8 = jax.nn.relu(_mm(nh7, n7w) + n7b).astype(bf16)
    raw = _mm(nh8, ow) + ob
    if not return_acts:
        return raw
    return raw, dict(embb=embb, nh1=nh1, nh2=nh2, nh3=nh3, nh4=nh4, nh5=nh5,
                     nh6=nh6, nh7=nh7, nh8=nh8)


def _mlp_fwd_kernel(emb_ref, *rest):
    w = [r[:] for r in rest[:N_MLP_W]]
    rest[N_MLP_W][:] = _mlp_fwd_math(emb_ref[:], w)


def _mlp_bwd_math(emb, w, draw):
    """Shared reverse pass of the canonical chain (recompute-in-VMEM).
    Returns (demb f32, per-weight gradient list in pack order)."""
    (n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b, ow, ob) = w
    bf16 = jnp.bfloat16
    _, a = _mlp_fwd_math(emb, w, return_acts=True)

    def mmT_nt(x, wt):
        return jax.lax.dot_general(
            x.astype(bf16), wt.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmT_tn(act, g):
        return jax.lax.dot_general(
            act.astype(bf16), g.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bsum(g):
        return jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    drawb = draw.astype(bf16)
    g_ow = mmT_tn(a["nh8"], drawb)
    g_ob = bsum(draw)
    dh8 = (mmT_nt(drawb, ow)
           * (a["nh8"].astype(jnp.float32) > 0)).astype(bf16)
    g_n7w = mmT_tn(a["nh7"], dh8)
    g_n7b = bsum(dh8)
    dh7 = (mmT_nt(dh8, n7w)
           * (a["nh7"].astype(jnp.float32) > 0)).astype(bf16)
    g_n6w = mmT_tn(a["nh6"], dh7)
    g_n6b = bsum(dh7)
    dh6 = (mmT_nt(dh7, n6w)
           * (a["nh6"].astype(jnp.float32) > 0)).astype(bf16)
    g_n5h = mmT_tn(a["nh5"], dh6)
    g_n5e = mmT_tn(a["embb"], dh6)
    g_n5b = bsum(dh6)
    demb = mmT_nt(dh6, n5e)
    dh5 = (mmT_nt(dh6, n5h)
           * (a["nh5"].astype(jnp.float32) > 0)).astype(bf16)
    g_n4w = mmT_tn(a["nh4"], dh5)
    g_n4b = bsum(dh5)
    dh4 = (mmT_nt(dh5, n4w)
           * (a["nh4"].astype(jnp.float32) > 0)).astype(bf16)
    g_n3w = mmT_tn(a["nh3"], dh4)
    g_n3b = bsum(dh4)
    dh3 = (mmT_nt(dh4, n3w)
           * (a["nh3"].astype(jnp.float32) > 0)).astype(bf16)
    g_n2w = mmT_tn(a["nh2"], dh3)
    g_n2b = bsum(dh3)
    dh2 = (mmT_nt(dh3, n2w)
           * (a["nh2"].astype(jnp.float32) > 0)).astype(bf16)
    g_n1w = mmT_tn(a["nh1"], dh2)
    g_n1b = bsum(dh2)
    dh1 = (mmT_nt(dh2, n1w)
           * (a["nh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_n0w = mmT_tn(a["embb"], dh1)
    g_n0b = bsum(dh1)
    demb = demb + mmT_nt(dh1, n0w)

    grads = [g_n0w, g_n0b, g_n1w, g_n1b, g_n2w, g_n2b, g_n3w, g_n3b,
             g_n4w, g_n4b, g_n5e, g_n5h, g_n5b, g_n6w, g_n6b, g_n7w, g_n7b,
             g_ow, g_ob]
    return demb, grads


def _accumulate_dw(dw_refs, grads):
    """First grid step initializes the weight-grad accumulators, later
    steps add into them."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for dw, g in zip(dw_refs, grads):
            dw[:] = g

    @pl.when(i > 0)
    def _accum():
        for dw, g in zip(dw_refs, grads):
            dw[:] = dw[:] + g


def _mlp_bwd_kernel(emb_ref, *rest):
    w = [r[:] for r in rest[:N_MLP_W]]
    draw_ref = rest[N_MLP_W]
    demb_ref = rest[N_MLP_W + 1]
    dw_refs = rest[N_MLP_W + 2:]
    demb, grads = _mlp_bwd_math(emb_ref[:], w, draw_ref[:])
    demb_ref[:] = demb
    _accumulate_dw(dw_refs, grads)


MLP_FWD_BLOCK = 4096   # forward working set is small (bf16 acts); large
                       # blocks amortize per-grid-step overhead (8192
                       # exceeds the 16 MB VMEM budget)
MLP_BWD_BLOCK = 2048   # bf16 weight copies + bf16 recomputed acts leave
                       # room for 2048-pt backward blocks (~15 MB live);
                       # measured 6.3 ms vs 6.6 ms at 512 for 196k pts


def _mlp_pallas_fwd(embb, mwb, block):
    n, emb_cols = embb.shape
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    return pl.pallas_call(
        _mlp_fwd_kernel,
        grid=(n // block,),
        in_specs=[_io_spec(block, emb_cols)] + w_specs,
        out_specs=_io_spec(block, OUT_PAD),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
    )(embb, *mwb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mlp_core(emb, mw, block):
    """MLP-only kernel over emb (n, EMB) f32 or bf16. The bf16 cast of the
    embedding (which the kernel math performs regardless) happens in XLA so
    the HBM hop between the bend stage and this kernel is half-width."""
    return _mlp_pallas_fwd(emb.astype(jnp.bfloat16),
                           _cast_matmul_weights(mw), block)


def _mlp_core_fwd(emb, mw, block):
    embb = emb.astype(jnp.bfloat16)
    out = _mlp_pallas_fwd(embb, _cast_matmul_weights(mw), block)
    # residuals hold the bf16 embedding (what the kernel consumes anyway)
    # and the f32 master weights (dw dtypes derive from them)
    return out, (embb, mw)


def _mlp_core_bwd(block, residuals, draw):
    embb, mw = residuals
    n, emb_cols = embb.shape
    block = min(block, MLP_BWD_BLOCK)
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in mw]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in mw]
    mwb = _cast_matmul_weights(mw)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    out = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(n // block,),
        in_specs=([_io_spec(block, emb_cols)] + w_specs
                  + [_io_spec(block, OUT_PAD)]),
        out_specs=[_io_spec(block, emb_cols)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n, emb_cols), jnp.float32)]
                   + dw_shapes),
        # 28 MB, not the usual 24: under the two-phase (train/test-latent)
        # backward the compiler lays this kernel out 366 KB past 24 MB at
        # 2048-pt blocks (observed on v5e with train/test block splits);
        # the chip has 128 MB VMEM, so the bigger scope costs nothing
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024),
    )(embb, *mwb, draw)
    demb = out[0].astype(jnp.float32)
    return demb, tuple(out[1:])


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


# ---------------------------------------------------------------------------
# Encode-in-kernel variant: the kernel consumes BENT POINTS (n, PTS_PAD f32)
# and computes the Fourier encoding in VMEM via the (P, phase)
# sin-with-phase projection (_embed). Next to _mlp_core this removes the
# widest HBM tensors of the hybrid path — the (n, EMB) bf16 embedding the
# bend stage writes / the kernel reads on the forward, and the (n, EMB) f32
# dembedding on the backward — replacing both with (n, PTS_PAD): 16x/16x
# narrower. The bend/rigidity MLPs themselves stay in XLA (measured faster
# there; ROADMAP.md negative results).
# ---------------------------------------------------------------------------

N_MLPE_W = N_MLP_W + 2   # + P (PTS_PAD, EMB) f32, phase (1, EMB) f32


def pack_mlp_pts_weights(params, network: str = "coarse",
                         multires: int = 10):
    """pack_mlp_weights + the encoding projection, for `_mlpe_core`."""
    P, phase = _embedding_projection(multires)
    return pack_mlp_weights(params, network) + (
        jnp.asarray(P), jnp.asarray(phase).reshape(1, EMB))


def _cast_mlpe_weights(mw):
    # keep P / phase f32: they feed the HIGHEST-precision encoding dot
    return _cast_matmul_weights(mw, f32_only=(N_MLP_W, N_MLP_W + 1))


def _embed_ew(pts, P, phase):
    """_embed without the matmul: pre = sum_d pts[:, d:d+1] * P[d] — three
    f32 broadcast-multiplies (exact: P entries are powers of two), cheaper
    in Mosaic than a HIGHEST-precision dot."""
    pre = (pts[:, 0:1] * P[0:1, :] + pts[:, 1:2] * P[1:2, :]
           + pts[:, 2:3] * P[2:3, :])
    lane = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    emb = jnp.where(lane < 3, pre, jnp.sin(pre + phase))
    return pre, lane, emb


def _mlpe_fwd_kernel(pts_ref, *rest):
    w = [r[:] for r in rest[:N_MLPE_W]]
    _, _, emb = _embed_ew(pts_ref[:], w[N_MLP_W], w[N_MLP_W + 1])
    rest[N_MLPE_W][:] = _mlp_fwd_math(emb.astype(jnp.bfloat16),
                                      w[:N_MLP_W])


def _mlpe_bwd_kernel(pts_ref, *rest):
    w = [r[:] for r in rest[:N_MLPE_W]]
    draw_ref = rest[N_MLPE_W]
    dpts_ref = rest[N_MLPE_W + 1]
    dw_refs = rest[N_MLPE_W + 2:]
    P, phase = w[N_MLP_W], w[N_MLP_W + 1]
    pre, lane, emb = _embed_ew(pts_ref[:], P, phase)
    demb, grads = _mlp_bwd_math(emb.astype(jnp.bfloat16), w[:N_MLP_W],
                                draw_ref[:])
    # d/dpre of where(lane<3, pre, sin(pre + phase)); then fold back onto
    # the three point lanes (exact: P rows are powers of two + one-hots)
    dpre = jnp.where(lane < 3, demb, demb * jnp.cos(pre + phase))
    dpts = jnp.concatenate(
        [jnp.sum(dpre * P[d:d + 1, :], axis=1, keepdims=True)
         for d in range(3)]
        + [jnp.zeros((dpre.shape[0], PTS_PAD - 3), jnp.float32)], axis=1)
    dpts_ref[:] = dpts
    _accumulate_dw(dw_refs, grads)


def _mlpe_pallas_fwd(pts_pad, mwb, block):
    n = pts_pad.shape[0]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    return pl.pallas_call(
        _mlpe_fwd_kernel,
        grid=(n // block,),
        in_specs=[_io_spec(block, PTS_PAD)] + w_specs,
        out_specs=_io_spec(block, OUT_PAD),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(pts_pad, *mwb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mlpe_core(pts_pad, mw, block):
    """Canonical MLP over bent points (n, PTS_PAD) f32, encoding in VMEM.
    mw from pack_mlp_pts_weights. Returns raw (n, OUT_PAD) f32."""
    return _mlpe_pallas_fwd(pts_pad, _cast_mlpe_weights(mw), block)


def _mlpe_core_fwd(pts_pad, mw, block):
    out = _mlpe_pallas_fwd(pts_pad, _cast_mlpe_weights(mw), block)
    return out, (pts_pad, mw)


MLPE_BWD_BLOCK = 1024   # the encode recompute adds ~2 MB of f32
                        # intermediates per 1024 pts; 2048 blew the 24 MB
                        # scoped-VMEM budget (measured 30 MB)


def _mlpe_core_bwd(block, residuals, draw):
    pts_pad, mw = residuals
    n = pts_pad.shape[0]
    block = min(block, MLPE_BWD_BLOCK)
    mlp_w = mw[:N_MLP_W]
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in mlp_w]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in mlp_w]
    mwb = _cast_mlpe_weights(mw)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    out = pl.pallas_call(
        _mlpe_bwd_kernel,
        grid=(n // block,),
        in_specs=([_io_spec(block, PTS_PAD)] + w_specs
                  + [_io_spec(block, OUT_PAD)]),
        out_specs=[_io_spec(block, PTS_PAD)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n, PTS_PAD), jnp.float32)]
                   + dw_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(pts_pad, *mwb, draw)
    dpts = out[0]
    # P / phase are encoding constants — zero cotangent
    dmw = tuple(out[1:]) + (jnp.zeros_like(mw[N_MLP_W]),
                            jnp.zeros_like(mw[N_MLP_W + 1]))
    return dpts, dmw


_mlpe_core.defvjp(_mlpe_core_fwd, _mlpe_core_bwd)


# ---------------------------------------------------------------------------
# Viewdirs variant of the MLP kernel: the canonical 8x256 chain plus the
# view-conditioned heads (reference: run_nerf_helpers.py:283-304 —
# alpha = alpha_linear(h); feature = feature_linear(h) [no activation];
# hv = relu(views_linear(cat([feature, embedded_views]))); rgb =
# rgb_linear(hv); raw = cat([rgb, alpha])). The view-direction COMPUTATION
# (finite differences / bending jvp) stays in XLA — only the MLP FLOPs move
# into VMEM. Without this kernel, use_viewdirs training fell back to XLA
# entirely (~2.5x slower than the no-viewdirs fused step, vs the
# reference's documented 20-35% viewdirs overhead, README.md:128).
# ---------------------------------------------------------------------------

VEMB = 32            # 27 view-encoding channels (multires_views=4) padded
VW = 128             # views head width = netwidth // 2
N_MLPV_W = 26        # packed weight-tuple length


def pack_viewdirs_mlp_weights(params, network: str = "coarse"):
    """Flatten a viewdirs canonical MLP into the kernel's padded f32 weight
    tuple (pts chain as in pack_fused_weights, then the four heads; rgb and
    alpha both land in the OUT_PAD raw lanes: rgb -> 0:3, alpha -> 3)."""
    pts_layers = params[network]["pts"]

    def pad_w(w, rows, cols):
        out = jnp.zeros((rows, cols), jnp.float32)
        return out.at[:w.shape[0], :w.shape[1]].set(w)

    def pad_b(b, cols):
        out = jnp.zeros((1, cols), jnp.float32)
        return out.at[0, :b.shape[0]].set(b)

    ws = [pad_w(pts_layers[0]["w"], EMB, NW), pad_b(pts_layers[0]["b"], NW)]
    for i in (1, 2, 3, 4):
        ws += [pts_layers[i]["w"], pad_b(pts_layers[i]["b"], NW)]
    w5 = pts_layers[5]["w"]
    ws += [pad_w(w5[:63], EMB, NW), w5[63:], pad_b(pts_layers[5]["b"], NW)]
    for i in (6, 7):
        ws += [pts_layers[i]["w"], pad_b(pts_layers[i]["b"], NW)]

    fl = params[network]["feature"]
    al = params[network]["alpha"]
    vl = params[network]["views"][0]
    rl = params[network]["rgb"]
    valpha = jnp.zeros((NW, OUT_PAD), jnp.float32).at[:, 3:4].set(al["w"])
    balpha = jnp.zeros((1, OUT_PAD), jnp.float32).at[0, 3:4].set(al["b"])
    vrgb = jnp.zeros((VW, OUT_PAD), jnp.float32).at[:, :3].set(rl["w"])
    brgb = jnp.zeros((1, OUT_PAD), jnp.float32).at[0, :3].set(rl["b"])
    ws += [
        fl["w"], pad_b(fl["b"], NW),                    # 17,18 feature
        valpha, balpha,                                 # 19,20 alpha -> lane 3
        vl["w"][:NW],                                   # 21 views (feature part)
        pad_w(vl["w"][NW:], VEMB, VW),                  # 22 views (dirs part)
        pad_b(vl["b"], VW),                             # 23
        vrgb, brgb,                                     # 24,25 rgb -> lanes 0:3
    ]
    assert len(ws) == N_MLPV_W
    return tuple(ws)


def _mlpv_fwd_math(emb, embv, w, return_acts=False):
    (n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b,
     fw, fb, aw, ab, vwf, vwv, vb, rw, rb) = w
    bf16 = jnp.bfloat16
    embb = emb.astype(bf16)
    embvb = embv.astype(bf16)
    nh1 = jax.nn.relu(_mm(embb, n0w) + n0b).astype(bf16)
    nh2 = jax.nn.relu(_mm(nh1, n1w) + n1b).astype(bf16)
    nh3 = jax.nn.relu(_mm(nh2, n2w) + n2b).astype(bf16)
    nh4 = jax.nn.relu(_mm(nh3, n3w) + n3b).astype(bf16)
    nh5 = jax.nn.relu(_mm(nh4, n4w) + n4b).astype(bf16)
    nh6 = jax.nn.relu(_mm(nh5, n5h) + _mm(embb, n5e) + n5b).astype(bf16)
    nh7 = jax.nn.relu(_mm(nh6, n6w) + n6b).astype(bf16)
    nh8 = jax.nn.relu(_mm(nh7, n7w) + n7b).astype(bf16)
    feat = (_mm(nh8, fw) + fb).astype(bf16)            # NO activation
    hv = jax.nn.relu(_mm(feat, vwf) + _mm(embvb, vwv) + vb).astype(bf16)
    raw = _mm(hv, rw) + rb + _mm(nh8, aw) + ab         # rgb lanes 0:3, alpha 3
    if not return_acts:
        return raw
    return raw, dict(embb=embb, embvb=embvb, nh1=nh1, nh2=nh2, nh3=nh3,
                     nh4=nh4, nh5=nh5, nh6=nh6, nh7=nh7, nh8=nh8,
                     feat=feat, hv=hv)


def _mlpv_fwd_kernel(emb_ref, embv_ref, *rest):
    w = [r[:] for r in rest[:N_MLPV_W]]
    rest[N_MLPV_W][:] = _mlpv_fwd_math(emb_ref[:], embv_ref[:], w)


def _mlpv_bwd_kernel(emb_ref, embv_ref, *rest):
    w = [r[:] for r in rest[:N_MLPV_W]]
    draw_ref = rest[N_MLPV_W]
    demb_ref = rest[N_MLPV_W + 1]
    dembv_ref = rest[N_MLPV_W + 2]
    dw_refs = rest[N_MLPV_W + 3:]
    (n0w, n0b, n1w, n1b, n2w, n2b, n3w, n3b, n4w, n4b,
     n5e, n5h, n5b, n6w, n6b, n7w, n7b,
     fw, fb, aw, ab, vwf, vwv, vb, rw, rb) = w
    bf16 = jnp.bfloat16
    _, a = _mlpv_fwd_math(emb_ref[:], embv_ref[:], w, return_acts=True)

    def mmT_nt(x, wt):
        return jax.lax.dot_general(
            x.astype(bf16), wt.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmT_tn(act, g):
        return jax.lax.dot_general(
            act.astype(bf16), g.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bsum(g):
        return jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    draw = draw_ref[:]
    drawb = draw.astype(bf16)

    # rgb head
    g_rw = mmT_tn(a["hv"], drawb)
    g_rb = bsum(draw)
    dhv = (mmT_nt(drawb, rw)
           * (a["hv"].astype(jnp.float32) > 0)).astype(bf16)
    # views layer
    g_vwf = mmT_tn(a["feat"], dhv)
    g_vwv = mmT_tn(a["embvb"], dhv)
    g_vb = bsum(dhv)
    dfeat = mmT_nt(dhv, vwf).astype(bf16)
    dembv_ref[:] = mmT_nt(dhv, vwv)
    # feature head (linear, no activation mask)
    g_fw = mmT_tn(a["nh8"], dfeat)
    g_fb = bsum(dfeat)
    # alpha head
    g_aw = mmT_tn(a["nh8"], drawb)
    g_ab = bsum(draw)
    dh8 = ((mmT_nt(dfeat, fw) + mmT_nt(drawb, aw))
           * (a["nh8"].astype(jnp.float32) > 0)).astype(bf16)

    g_n7w = mmT_tn(a["nh7"], dh8)
    g_n7b = bsum(dh8)
    dh7 = (mmT_nt(dh8, n7w)
           * (a["nh7"].astype(jnp.float32) > 0)).astype(bf16)
    g_n6w = mmT_tn(a["nh6"], dh7)
    g_n6b = bsum(dh7)
    dh6 = (mmT_nt(dh7, n6w)
           * (a["nh6"].astype(jnp.float32) > 0)).astype(bf16)
    g_n5h = mmT_tn(a["nh5"], dh6)
    g_n5e = mmT_tn(a["embb"], dh6)
    g_n5b = bsum(dh6)
    demb = mmT_nt(dh6, n5e)
    dh5 = (mmT_nt(dh6, n5h)
           * (a["nh5"].astype(jnp.float32) > 0)).astype(bf16)
    g_n4w = mmT_tn(a["nh4"], dh5)
    g_n4b = bsum(dh5)
    dh4 = (mmT_nt(dh5, n4w)
           * (a["nh4"].astype(jnp.float32) > 0)).astype(bf16)
    g_n3w = mmT_tn(a["nh3"], dh4)
    g_n3b = bsum(dh4)
    dh3 = (mmT_nt(dh4, n3w)
           * (a["nh3"].astype(jnp.float32) > 0)).astype(bf16)
    g_n2w = mmT_tn(a["nh2"], dh3)
    g_n2b = bsum(dh3)
    dh2 = (mmT_nt(dh3, n2w)
           * (a["nh2"].astype(jnp.float32) > 0)).astype(bf16)
    g_n1w = mmT_tn(a["nh1"], dh2)
    g_n1b = bsum(dh2)
    dh1 = (mmT_nt(dh2, n1w)
           * (a["nh1"].astype(jnp.float32) > 0)).astype(bf16)
    g_n0w = mmT_tn(a["embb"], dh1)
    g_n0b = bsum(dh1)
    demb_ref[:] = demb + mmT_nt(dh1, n0w)

    grads = [g_n0w, g_n0b, g_n1w, g_n1b, g_n2w, g_n2b, g_n3w, g_n3b,
             g_n4w, g_n4b, g_n5e, g_n5h, g_n5b, g_n6w, g_n6b, g_n7w, g_n7b,
             g_fw, g_fb, g_aw, g_ab, g_vwf, g_vwv, g_vb, g_rw, g_rb]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for dw, g in zip(dw_refs, grads):
            dw[:] = g

    @pl.when(i > 0)
    def _accum():
        for dw, g in zip(dw_refs, grads):
            dw[:] = dw[:] + g


def _mlpv_pallas_fwd(embb, embvb, mwb, block):
    n = embb.shape[0]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    return pl.pallas_call(
        _mlpv_fwd_kernel,
        grid=(n // block,),
        in_specs=[_io_spec(block, EMB), _io_spec(block, VEMB)] + w_specs,
        out_specs=_io_spec(block, OUT_PAD),
        out_shape=jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(embb, embvb, *mwb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mlpv_core(emb, embv, mw, block):
    """Viewdirs MLP kernel over emb (n, EMB) and embv (n, VEMB). Returns
    raw (n, OUT_PAD) with rgb in lanes 0:3, alpha in lane 3."""
    return _mlpv_pallas_fwd(emb.astype(jnp.bfloat16),
                            embv.astype(jnp.bfloat16),
                            _cast_matmul_weights(mw), block)


def _mlpv_core_fwd(emb, embv, mw, block):
    embb = emb.astype(jnp.bfloat16)
    embvb = embv.astype(jnp.bfloat16)
    out = _mlpv_pallas_fwd(embb, embvb, _cast_matmul_weights(mw), block)
    return out, (embb, embvb, mw)


MLPV_BWD_BLOCK = 1024   # the viewdirs backward additionally holds feat/hv
                        # acts + 9 extra weight-grad accumulators; 2048-pt
                        # blocks exceed the 24 MB VMEM budget (26.9 MB)


def _mlpv_core_bwd(block, residuals, draw):
    embb, embvb, mw = residuals
    n = embb.shape[0]
    block = min(block, MLPV_BWD_BLOCK)
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in mw]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in mw]
    mwb = _cast_matmul_weights(mw)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mwb]
    out = pl.pallas_call(
        _mlpv_bwd_kernel,
        grid=(n // block,),
        in_specs=([_io_spec(block, EMB), _io_spec(block, VEMB)] + w_specs
                  + [_io_spec(block, OUT_PAD)]),
        out_specs=[_io_spec(block, EMB), _io_spec(block, VEMB)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n, EMB), jnp.float32),
                    jax.ShapeDtypeStruct((n, VEMB), jnp.float32)]
                   + dw_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(embb, embvb, *mwb, draw)
    return out[0].astype(jnp.float32), out[1].astype(jnp.float32), \
        tuple(out[2:])


_mlpv_core.defvjp(_mlpv_core_fwd, _mlpv_core_bwd)



def fused_point_query_split(params, pts, latents, multires: int = 10,
                            network: str = "coarse",
                            block: int = DEFAULT_BLOCK):
    """Two-kernel version of fused_point_query (same signature/returns)."""
    weights = pack_fused_weights(params, multires, network)
    bw, mw = weights[:N_BEND_W], weights[N_BEND_W:]
    shape = pts.shape[:-1]
    n = int(np.prod(shape))
    n_pad = -(-n // block) * block

    pts_pad = jnp.zeros((n_pad, PTS_PAD), jnp.float32)
    pts_pad = pts_pad.at[:n, :3].set(pts.reshape(n, 3))
    lat_pad = jnp.zeros((n_pad, LAT), jnp.float32)
    lat_pad = lat_pad.at[:n].set(latents.reshape(n, LAT))

    emb, off, rig = _bend_core(pts_pad, lat_pad, bw, block)
    raw = _mlp_core(emb, mw, block)
    raw = raw[:n, :4].reshape(shape + (4,))
    off = off[:n, :3].reshape(shape + (3,))
    rig = rig[:n, 0:1].reshape(shape + (1,))
    return raw, off, rig


def fused_point_query(params, pts, latents, multires: int = 10,
                      network: str = "coarse", block: int = DEFAULT_BLOCK):
    """Evaluate the fused chain for pts (..., 3) with latents (..., LAT).

    Returns (raw (..., 4), unmasked_offsets (..., 3), rigidity (..., 1)).
    Differentiable wrt params, pts, and latents via the custom Pallas VJP.
    """
    weights = pack_fused_weights(params, multires, network)
    shape = pts.shape[:-1]
    n = int(np.prod(shape))
    n_pad = -(-n // block) * block

    pts_flat = pts.reshape(n, 3)
    pts_pad = jnp.zeros((n_pad, PTS_PAD), jnp.float32)
    pts_pad = pts_pad.at[:n, :3].set(pts_flat)
    lat_pad = jnp.zeros((n_pad, LAT), jnp.float32)
    lat_pad = lat_pad.at[:n].set(latents.reshape(n, LAT))

    raw, off, rig = _fused_core(pts_pad, lat_pad, weights, block)
    raw = raw[:n, :4].reshape(shape + (4,))
    off = off[:n, :3].reshape(shape + (3,))
    rig = rig[:n, 0:1].reshape(shape + (1,))
    return raw, off, rig
