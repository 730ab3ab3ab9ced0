"""Configuration for the NR-NeRF TPU framework.

The reference drives everything through ~45 configargparse flags
(reference: train.py:983-1219) plus a mutable dict of render kwargs
(reference: train.py:698-719) and monkey-patched module attributes for scene
editing (reference: free_viewpoint_rendering.py:264-323).  Here the same
surface is expressed as three frozen dataclasses, which double as *static*
arguments to `jax.jit`:

- ModelConfig:    network architecture + encoding (fixed for an experiment)
- RenderSettings: sampling/compositing knobs that differ train vs. test
- EditConfig:     test-time scene-editing controls (explicit, not monkey-patched)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the canonical NeRF + ray-bending networks.

    Field semantics mirror the reference flags (reference: train.py:1003-1219):
    netdepth/netwidth (canonical MLP), multires/multires_views (positional
    encoding), ray_bending ("None" | "simple_neural"), etc.
    """

    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    skips: Tuple[int, ...] = (4,)

    # positional encoding (reference: run_nerf_helpers.py:153-168)
    i_embed: int = 0            # 0 = fourier encoding, -1 = identity
    multires: int = 10
    multires_views: int = 4

    use_viewdirs: bool = False
    approx_nonrigid_viewdirs: bool = True

    # ray bending (reference: run_nerf_helpers.py:388-454)
    ray_bending: Optional[str] = "simple_neural"   # None | "simple_neural"
    ray_bending_latent_size: int = 32
    bending_depth: int = 5
    bending_width: int = 64
    # "relu" (reference default) or "sin" (the reference's dormant SIREN
    # branch, run_nerf_helpers.py:434-449)
    bending_activation: str = "relu"
    use_rigidity_network: bool = True
    rigidity_depth: int = 3
    rigidity_width: int = 32

    # naive baseline: concat latent to the canonical MLP input instead of bending
    # (reference: run_nerf_helpers.py:207-209,273-282)
    time_conditioned_baseline: bool = False

    # sampling counts (needed by the model for finite-difference viewdirs)
    N_samples: int = 64
    N_importance: int = 64

    # numerics: params are always fp32; compute_dtype sets the inter-layer
    # activation dtype of the XLA bend/rigidity path ("float32" = reference
    # parity, "bfloat16" = faster on TPU, measured ~-0.1 dB at 200k steps).
    compute_dtype: str = "float32"

    # fused Pallas point-query kernel: "auto" uses it on TPU whenever the
    # architecture + edit settings allow (see ops/pallas/fused_query.py),
    # "on" forces it, "off" always uses the plain XLA path. NOTE: the kernel
    # runs its matmuls on the bf16 MXU with f32 accumulation regardless of
    # compute_dtype (measured PSNR parity with the f32 XLA path); the
    # bend/rigidity stage honors compute_dtype. For strict reference-parity
    # numerics set fused_kernel = "off".
    # "int8" (inference-only) runs the canonical MLP on the MXU's int8 path
    # with post-training-calibrated activation scales (ops/pallas/
    # quant_mlp.py); requires params["quant"] from quantize_for_inference().
    # "pts" forces the kernel AND computes the Fourier encoding in VMEM
    # (bent points cross HBM instead of the 63-ch encoding) — measured
    # SLOWER than "auto" on v5e (118.6k vs 142.0k train rays/s; Mosaic's
    # sin outweighs the narrower hop), kept as an opt-in for parts with
    # tighter HBM bandwidth per FLOP.
    fused_kernel: str = "auto"

    # fine-pass reuse of the coarse samples' stage-1 (bend + encode) results
    # (engine/render.py): the bend of a point is pass-independent, so only
    # the NEW importance samples run the deformation field. False re-bends
    # the coarse z_vals inside the fine pass like the reference
    # (train.py:910-941) — a debugging/benchmarking knob, never needed for
    # correctness (values and gradients are identical either way; pinned by
    # tests/test_engine.py).
    stage1_reuse: bool = True

    def __post_init__(self):
        if self.ray_bending in ("None", "none", ""):
            object.__setattr__(self, "ray_bending", None)
        if self.time_conditioned_baseline and self.ray_bending is not None:
            raise ValueError("time_conditioned_baseline requires ray_bending=None "
                             "(reference: train.py:575-578)")

    @property
    def use_ray_bending(self) -> bool:
        return self.ray_bending is not None

    @property
    def input_ch(self) -> int:
        """Channels of the positionally-encoded 3D point."""
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires

    @property
    def input_ch_views(self) -> int:
        if not self.use_viewdirs:
            return 0
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires_views

    @property
    def output_ch(self) -> int:
        # vestigial 5th channel kept for weight-shape parity with the
        # reference (reference: train.py:592-593); only 4 are consumed.
        return 5 if self.N_importance > 0 else 4


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Per-call rendering knobs (reference: render_kwargs_train/test,
    train.py:698-719)."""

    N_samples: int = 64
    N_importance: int = 64
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    lindisp: bool = False
    white_bkgd: bool = False
    near: float = 0.0
    far: float = 1.0

    def test_mode(self) -> "RenderSettings":
        """The reference's render_kwargs_test: no jitter, no density noise
        (reference: train.py:717-719)."""
        return dataclasses.replace(self, perturb=0.0, raw_noise_std=0.0)


@dataclasses.dataclass(frozen=True)
class EditConfig:
    """Test-time scene editing. The reference implements these by temporarily
    mutating module attributes (reference: free_viewpoint_rendering.py:264-323,
    run_nerf_helpers.py:563-576,309-311); here they are explicit fields.
    """

    # zero rigidity mask below this value: forced background stabilization
    rigidity_test_time_cutoff: Optional[float] = None
    # scale masked offsets: motion exaggeration / dampening
    test_time_scaling: Optional[float] = None
    # zero density where rigidity >= threshold: foreground removal
    nonrigid_object_removal_threshold: Optional[float] = None
    # bypass the bending network entirely: render the canonical model
    render_canonical: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference: train.py:1016-1060,1631-1643)."""

    lrate: float = 5e-4
    lrate_decay: int = 250000
    N_iters: int = 200000
    N_rand: int = 1024
    warmup_steps: int = 1000
    offsets_loss_weight: float = 0.0
    divergence_loss_weight: float = 0.0
    rigidity_loss_weight: float = 0.0
    seed: int = 0


# ---------------------------------------------------------------------------
# File-based experiment config, compatible with the reference's
# configargparse "key = value" files (configs/default.txt).
# ---------------------------------------------------------------------------

_BOOL_KEYS = {
    "no_reload", "render_test", "spherify", "debug", "use_viewdirs",
    "approx_nonrigid_viewdirs", "time_conditioned_baseline",
    "use_rigidity_network",
}
_BOOL_KEYS.add("metrics_file")
_INT_KEYS = {
    "netdepth", "netwidth", "netdepth_fine", "netwidth_fine", "N_iters",
    "N_rand", "chunk", "netchunk", "seed", "ray_bending_latent_size",
    "train_block_size", "test_block_size", "N_samples", "N_importance",
    "i_embed", "multires", "multires_views", "render_factor",
    "precrop_iters", "factor", "i_print", "i_img", "i_weights", "i_testset",
    "i_video", "lrate_decay", "profile_steps", "die_at_step",
    "bending_depth", "bending_width", "rigidity_depth", "rigidity_width",
    "sampling_prefetch",
}
_FLOAT_KEYS = {
    "lrate", "perturb", "offsets_loss_weight", "divergence_loss_weight",
    "rigidity_loss_weight", "raw_noise_std", "precrop_frac",
}

DEFAULTS = {
    # mirrors reference config_parser defaults (reference: train.py:983-1219)
    "config": None,
    "expname": None,
    "datadir": None,
    "rootdir": None,
    "netdepth": 8, "netwidth": 256, "netdepth_fine": 8, "netwidth_fine": 256,
    "N_iters": 200000, "N_rand": 4096, "lrate": 5e-4, "lrate_decay": 250000,
    "chunk": 32768, "netchunk": 65536,
    "no_reload": False, "ft_path": None, "seed": -1,
    "ray_bending": "None", "ray_bending_latent_size": 32,
    "approx_nonrigid_viewdirs": False, "time_conditioned_baseline": False,
    # TPU-native knobs (no reference analog)
    "bending_depth": 5, "bending_width": 64,
    "rigidity_depth": 3, "rigidity_width": 32,
    "use_rigidity_network": True, "bending_activation": "relu",
    "compute_dtype": "float32", "fused_kernel": "auto",
    "train_block_size": 0, "test_block_size": 0,
    "N_samples": 64, "N_importance": 0, "perturb": 1.0,
    "offsets_loss_weight": 0.0, "divergence_loss_weight": 0.0,
    "rigidity_loss_weight": 0.0,
    "use_viewdirs": False, "i_embed": 0, "multires": 10, "multires_views": 4,
    "raw_noise_std": 0.0, "render_factor": 0, "render_test": False,
    "precrop_iters": 0, "precrop_frac": 0.5, "debug": False,
    "dataset_type": "llff", "factor": 8, "spherify": False,
    "bd_factor": "0.75",
    "i_print": 100, "i_img": 500, "i_weights": 1000, "i_testset": 50000,
    "i_video": 50000,
    # observability (TPU equivalents of the reference's wall-clock prints,
    # SURVEY.md §5): XLA profiler trace of a training-step window, and a
    # machine-readable metrics stream next to the console log
    "profile_steps": 0,
    "metrics_file": True,
    # fault injection for crash-recovery testing: SIGKILL this process at
    # the END of exactly this step (after any checkpoint written at it);
    # 0 = off. Fires only in a fresh (step-0) run — resumed runs never
    # re-die, even when the step is not checkpoint-aligned.
    "die_at_step": 0,
    # persistent XLA compilation cache: cuts the first-step compile from
    # ~130s (cold) to ~12s on the TPU box; "" disables
    "compilation_cache_dir": "~/.cache/nonrigid_nerf_tpu/xla",
    # batch presampling cadence (TPU-native; see engine/train_step.py
    # make_prefetch_train_step): every N steps, ONE program takes the
    # device-resident image stack and presamples N ray batches; the
    # per-step program never sees the stack. On the tunneled runtime every
    # execution passing the stack pays a per-call cost proportional to its
    # size (~17.8 ms at 2.5 GB — round-5 scale-envelope finding), so this
    # restores full step rate on large datasets. -1 = auto (64 when the
    # stack is >= 256 MB, else fused), 0/1 = fused sampling, N>1 = force.
    # All modes sample identical pixels with identical RNG streams
    # (trajectories agree to float roundoff).
    "sampling_prefetch": -1,
    # checkpoint storage backend: "npz" (single self-describing file,
    # default) or "orbax" (Orbax/TensorStore directory — the JAX-ecosystem
    # layer, natively extendable to sharded global arrays). Both restore
    # bit-identically (nonrigid_nerf_tpu/checkpoints.py)
    "checkpoint_format": "npz",
}


def _coerce(key: str, value: str):
    value = value.strip()
    # strip inline comments: "simple_neural # None, simple_neural"
    if "#" in value:
        value = value.split("#", 1)[0].strip()
    if key in _BOOL_KEYS:
        return value.lower() in ("true", "1", "yes")
    if key in _INT_KEYS:
        return int(value)
    if key in _FLOAT_KEYS:
        return float(value)
    if value in ("None", ""):
        return None if key != "ray_bending" else "None"
    return value


def parse_config_file(path: str) -> dict:
    """Parse a reference-style "key = value" config file."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, value = line.split("=", 1)
            key = key.strip()
            out[key] = _coerce(key, value)
    return out


class Args:
    """Attribute-style view over the flat config dict, mirroring the
    reference's argparse Namespace so experiment args.txt files round-trip
    (reference: free_viewpoint_rendering.py:32-34)."""

    def __init__(self, **kwargs):
        merged = dict(DEFAULTS)
        merged.update(kwargs)
        self.__dict__.update(merged)

    def replace(self, **kwargs) -> "Args":
        d = dict(self.__dict__)
        d.update(kwargs)
        return Args(**d)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    def dump(self, path: str) -> None:
        """Write args.txt in the reference's sorted `key = value` format
        (reference: train.py:1437-1441), re-parseable by load_args."""
        with open(path, "w") as f:
            for key in sorted(self.__dict__):
                f.write("{} = {}\n".format(key, self.__dict__[key]))


def load_args(config_path: Optional[str] = None, **overrides) -> Args:
    values = {}
    if config_path is not None:
        values.update(parse_config_file(config_path))
        values["config"] = config_path
    values.update(overrides)
    return Args(**values)


def model_config_from_args(args: Args) -> ModelConfig:
    return ModelConfig(
        netdepth=args.netdepth, netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine, netwidth_fine=args.netwidth_fine,
        i_embed=args.i_embed, multires=args.multires,
        multires_views=args.multires_views,
        use_viewdirs=args.use_viewdirs,
        approx_nonrigid_viewdirs=args.approx_nonrigid_viewdirs,
        ray_bending=args.ray_bending,
        ray_bending_latent_size=args.ray_bending_latent_size,
        bending_depth=args.bending_depth, bending_width=args.bending_width,
        bending_activation=args.bending_activation,
        use_rigidity_network=args.use_rigidity_network,
        rigidity_depth=args.rigidity_depth,
        rigidity_width=args.rigidity_width,
        time_conditioned_baseline=args.time_conditioned_baseline,
        N_samples=args.N_samples, N_importance=args.N_importance,
        compute_dtype=args.compute_dtype, fused_kernel=args.fused_kernel,
    )


def resolve_seed(args: Args) -> Args:
    """seed=-1 means 'unseeded': draw a fresh random seed. The resolved value
    is what gets dumped to args.txt, so the run stays reproducible after the
    fact (reference analog: -1 leaves torch RNG unseeded, train.py:1052)."""
    if args.seed is not None and args.seed >= 0:
        return args
    import secrets
    return args.replace(seed=secrets.randbelow(2 ** 31))


def train_config_from_args(args: Args) -> TrainConfig:
    return TrainConfig(
        lrate=args.lrate, lrate_decay=args.lrate_decay, N_iters=args.N_iters,
        N_rand=args.N_rand,
        offsets_loss_weight=args.offsets_loss_weight,
        divergence_loss_weight=args.divergence_loss_weight,
        rigidity_loss_weight=args.rigidity_loss_weight,
        seed=resolve_seed(args).seed,
    )


def render_settings_from_args(args: Args, near: float, far: float) -> RenderSettings:
    return RenderSettings(
        N_samples=args.N_samples, N_importance=args.N_importance,
        perturb=args.perturb, raw_noise_std=args.raw_noise_std,
        lindisp=False, white_bkgd=False, near=float(near), far=float(far),
    )


def default_config_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "configs", "default.txt")
