"""Native JAX LPIPS (AlexNet backbone) for the evaluation protocol.

The reference computes LPIPS through a cloned PerceptualSimilarity repo +
pretrained torch AlexNet (reference: free_viewpoint_rendering.py:790-797,
846-855). Here the full pipeline — AlexNet conv features, channel-unit
normalization, learned linear calibration, spatial averaging — is
implemented in JAX; only the *weights* are external, loaded from a single
`.npz` file because pretrained AlexNet weights cannot be bundled here.

Weight resolution order:
  1. `$NRN_LPIPS_WEIGHTS` (path to the npz)
  2. `<repo>/data/lpips_alex.npz`
  3. `~/.cache/nonrigid_nerf_tpu/lpips_alex.npz`
Produce the file once with `python tools/convert_lpips_weights.py` on any
machine with the `lpips` pip package (it converts the official checkpoint);
the npz schema is documented there and in `weight_spec()`.

Pipeline (must match lpips.LPIPS(net='alex') exactly):
  x in [0,1] -> 2x-1 -> (x - shift)/scale -> AlexNet relu1..relu5 features
  -> unit-normalize channels -> squared difference -> 1x1 linear (non-neg
  weights) -> spatial mean -> sum over the 5 taps.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import numpy as np

# AlexNet `features` trunk (torchvision layout). Each tap is the activation
# after the listed ReLU; pools belong to the *following* slice, as in the
# lpips package's slice1..slice5 split.
_CONVS = (
    # (out_ch, in_ch, kernel, stride, pad, maxpool_before)
    (64, 3, 11, 4, 2, False),
    (192, 64, 5, 1, 2, True),
    (384, 192, 3, 1, 1, True),
    (256, 384, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def weight_spec():
    """The npz schema: conv{i}_w (O,I,kh,kw) OIHW, conv{i}_b (O,),
    lin{i}_w (C_i,) for i in 0..4."""
    spec = {}
    for i, (out_ch, in_ch, k, _, _, _) in enumerate(_CONVS):
        spec[f"conv{i}_w"] = (out_ch, in_ch, k, k)
        spec[f"conv{i}_b"] = (out_ch,)
        spec[f"lin{i}_w"] = (out_ch,)
    return spec


def _candidate_paths():
    env = os.environ.get("NRN_LPIPS_WEIGHTS")
    if env:
        yield env
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(repo, "data", "lpips_alex.npz")
    yield os.path.join(os.path.expanduser("~"), ".cache",
                       "nonrigid_nerf_tpu", "lpips_alex.npz")


def load_weights(path: Optional[str] = None) -> Optional[Dict[str, np.ndarray]]:
    """Load and validate the LPIPS weight npz; None when unavailable."""
    paths = [path] if path else list(_candidate_paths())
    for p in paths:
        if p and os.path.exists(p):
            with np.load(p) as data:
                weights = {k: np.asarray(data[k], np.float32)
                           for k in data.files}
            for key, shape in weight_spec().items():
                if key not in weights or weights[key].shape != shape:
                    raise ValueError(
                        f"{p}: bad LPIPS weight file — {key} should have "
                        f"shape {shape}, got "
                        f"{weights.get(key) is not None and weights[key].shape}")
            return weights
    return None


def _maxpool_3x3_s2(x):
    import jax.lax as lax
    import jax.numpy as jnp
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 1, 3, 3),
        window_strides=(1, 1, 2, 2), padding="VALID")


def _conv(x, w, b, stride, pad):
    import jax.lax as lax
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _alexnet_taps(x, weights):
    """x: (N, 3, H, W) already shift/scale-normalized. Returns the 5 ReLU
    tap activations."""
    import jax.nn
    taps = []
    h = x
    for i, (_, _, _, stride, pad, pool_before) in enumerate(_CONVS):
        if pool_before:
            h = _maxpool_3x3_s2(h)
        h = jax.nn.relu(_conv(h, weights[f"conv{i}_w"],
                              weights[f"conv{i}_b"], stride, pad))
        taps.append(h)
    return taps


def _lpips_pair(img_a, img_b, weights):
    """img_*: (H, W, 3) float32 in [0, 1]. Returns scalar distance."""
    import jax.numpy as jnp

    def prep(img):
        x = 2.0 * img - 1.0                                  # [-1, 1]
        x = (x - _SHIFT) / _SCALE
        return jnp.transpose(x, (2, 0, 1))[None]             # (1, 3, H, W)

    taps_a = _alexnet_taps(prep(img_a), weights)
    taps_b = _alexnet_taps(prep(img_b), weights)

    def unit_norm(f):
        norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
        return f / (norm + 1e-10)

    total = 0.0
    for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
        diff = jnp.square(unit_norm(fa) - unit_norm(fb))     # (1, C, H, W)
        lin = weights[f"lin{i}_w"][None, :, None, None]
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return total


@functools.lru_cache(maxsize=1)
def _get_model():
    """(weights-as-jnp, jitted pair fn) or None when no weight file exists."""
    weights = load_weights()
    if weights is None:
        return None
    import jax
    import jax.numpy as jnp
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    fn = jax.jit(functools.partial(_lpips_pair, weights=w))
    return fn


def lpips_available() -> bool:
    return _get_model() is not None


def reset_cache() -> None:
    """Forget the cached weight file (for tests / after installing weights)."""
    _get_model.cache_clear()


def _pipeline_supports(h: int, w: int) -> bool:
    """Whether the AlexNet trunk produces non-empty activations for an
    (h, w) image — every conv/pool output dim must stay >= 1."""
    def ok(d):
        for (_, _, k, stride, pad, pool_before) in _CONVS:
            if pool_before:
                if d < 3:
                    return False
                d = (d - 3) // 2 + 1
            d = (d + 2 * pad - k) // stride + 1
            if d < 1:
                return False
        return True
    return ok(h) and ok(w)


def lpips_alex(groundtruth: np.ndarray,
               generated: np.ndarray) -> Optional[float]:
    """LPIPS(AlexNet) distance of two (H, W, 3) images in [0, 1], or None
    when no weight file is installed or the images are smaller than the
    trunk's receptive requirements (~31 px per side)."""
    import jax.numpy as jnp
    fn = _get_model()
    if fn is None:
        return None
    h, w = np.asarray(groundtruth).shape[:2]
    if not _pipeline_supports(h, w):
        print(f"lpips: image {h}x{w} too small for the AlexNet trunk; "
              "skipping", flush=True)
        return None
    a = jnp.asarray(groundtruth, jnp.float32)
    b = jnp.asarray(generated, jnp.float32)
    return float(fn(a, b))
