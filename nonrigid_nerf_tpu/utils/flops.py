"""Static model-FLOP accounting for MFU reporting.

Everything here is derived from the config alone (shapes are static under
jit), so bench.py can report hardware-independent numbers next to rays/s:
`model_tflops_per_sec` and `mfu_vs_bf16_peak`.

Conventions (documented so the numbers are comparable across rounds):

- Only MATMUL FLOPs are counted (2 * in * out per dense layer per point).
  Positional encodings, activations, compositing, sorting, Adam, and the
  loss arithmetic are excluded — they are an O(width) sliver next to the
  O(width^2) dense chain, and excluding them makes MFU a slight
  UNDERESTIMATE (conservative).
- "Model FLOPs" are the ALGORITHM's required FLOPs, not the FLOPs executed:
  rematerialized recomputes inside custom VJPs do not count (standard MFU
  convention), while genuine algorithmic work (the divergence-loss jvp, the
  exact-viewdirs jvp) does.
- Training counts forward + backward as 3x forward (each dense backward is
  two matmuls: dL/dx and dL/dW). A jvp costs 2x the primal forward and is
  itself differentiated, so it contributes 3 * 2x.
- The fine pass reuses the coarse samples' stage-1 (bend+encode) results
  (engine/render.py `stage1_reuse`), so bend work is counted once per
  distinct sample point when reuse is active; the reference re-bends
  (reference train.py:910-941) but FLOPs here describe THIS implementation.
"""

from __future__ import annotations

from nonrigid_nerf_tpu.config import ModelConfig


def _dense_chain_flops(pairs) -> int:
    """2 * in * out summed over (in, out) layer shapes — per point, forward."""
    return int(sum(2 * i * o for i, o in pairs))


def canonical_mlp_flops(cfg: ModelConfig, network: str = "coarse") -> int:
    """Forward matmul FLOPs of one canonical-MLP point query
    (models/nerf.py:nerf_mlp_apply)."""
    D = cfg.netdepth if network == "coarse" else cfg.netdepth_fine
    W = cfg.netwidth if network == "coarse" else cfg.netwidth_fine
    input_ch = cfg.input_ch
    if cfg.time_conditioned_baseline:
        input_ch += cfg.ray_bending_latent_size
    pairs = [(input_ch, W)]
    for i in range(D - 1):
        pairs.append((W + input_ch if i in cfg.skips else W, W))
    if cfg.use_viewdirs:
        pairs += [(W, W), (W, 1), (cfg.input_ch_views + W, W // 2),
                  (W // 2, 3)]
    else:
        pairs += [(W, cfg.output_ch)]
    return _dense_chain_flops(pairs)


def bender_flops(cfg: ModelConfig) -> int:
    """Forward matmul FLOPs of one bending-MLP point query
    (models/bending.py:unmasked_offsets_fn)."""
    if not cfg.use_ray_bending:
        return 0
    pairs, in_dim = [], 3 + cfg.ray_bending_latent_size
    for _ in range(cfg.bending_depth - 1):
        pairs.append((in_dim, cfg.bending_width))
        in_dim = cfg.bending_width
    pairs.append((in_dim, 3))
    return _dense_chain_flops(pairs)


def rigidity_flops(cfg: ModelConfig) -> int:
    """Forward matmul FLOPs of one rigidity-MLP point query
    (models/bending.py:rigidity_mask_fn)."""
    if not (cfg.use_ray_bending and cfg.use_rigidity_network):
        return 0
    pairs, in_dim = [], 3
    for _ in range(cfg.rigidity_depth - 1):
        pairs.append((in_dim, cfg.rigidity_width))
        in_dim = cfg.rigidity_width
    pairs.append((in_dim, 1))
    return _dense_chain_flops(pairs)


def render_flops_per_ray(cfg: ModelConfig) -> int:
    """Forward-only model FLOPs of rendering one ray (coarse + fine pass)."""
    from nonrigid_nerf_tpu.engine.render import stage1_reuse
    S, I = cfg.N_samples, cfg.N_importance
    bend = bender_flops(cfg) + rigidity_flops(cfg)
    n_union = S + I if I > 0 else S
    # distinct sample points bent once under reuse; re-bent otherwise
    n_bend = (S + I) if (stage1_reuse(cfg) or I == 0) else (S + n_union)
    total = n_bend * bend
    total += S * canonical_mlp_flops(cfg, "coarse")
    if I > 0:
        total += n_union * canonical_mlp_flops(cfg, "fine")
    if cfg.use_viewdirs and cfg.use_ray_bending \
            and not cfg.approx_nonrigid_viewdirs:
        # exact nonrigid viewdirs: one jvp of the bender per queried point
        # and pass (engine/query.py), 2x a bender forward each
        total += n_bend * 2 * bender_flops(cfg)
    return int(total)


def train_flops_per_ray(cfg: ModelConfig, divergence_weight: float = 1.0,
                        divergence_exact: bool = False,
                        n_backwards: int = 1) -> int:
    """Model FLOPs of one training step, per ray (forward + backward).

    `n_backwards`: cotangent pulls through the shared linearization. The
    block train/test split mode (engine/train_step.py:57-69) pulls TWO
    cotangents through one jax.vjp — the reference's two backward passes
    over one retained graph (reference train.py:1594-1608) — so its
    algorithmic cost is (1 + 2*2) = 5x a forward; the default is 3x.
    """
    fwd = render_flops_per_ray(cfg)
    if cfg.use_ray_bending and divergence_weight > 0.0:
        # divergence loss re-bends the S coarse points under a jvp
        # (engine/losses.py:divergence_loss): 2x bender per probe
        probes = 3 if divergence_exact else 1
        fwd += cfg.N_samples * probes * 2 * bender_flops(cfg)
    return int((1 + 2 * n_backwards) * fwd)


# bf16 dense peak per chip, TFLOP/s. Sources: published TPU spec sheets
# (v4: 275, v5e: 197, v5p: 459, v6e: 918).
_BF16_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5": 459.0, "TPU v5p": 459.0,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def device_bf16_peak_tflops(device) -> float | None:
    """Per-chip bf16 peak for a jax Device, or None when unknown (CPU, new
    TPU generations not in the table)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in _BF16_PEAK_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return None
