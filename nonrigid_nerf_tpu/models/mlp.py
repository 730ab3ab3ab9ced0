"""Dense-layer primitives over plain param pytrees.

Weights are stored (fan_in, fan_out) — the natural layout for `x @ w` on the
MXU — with initializations matching the reference exactly, since NR-NeRF's
"start from straight rays" behavior depends on them
(reference: run_nerf_helpers.py:434-454,502-505).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def dense_init(key, fan_in: int, fan_out: int, init: str = "torch_default",
               use_bias: bool = True, dtype=jnp.float32):
    """Initialize one dense layer.

    init modes:
      "torch_default": weight, bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) —
          torch.nn.Linear's default (kaiming_uniform with a=sqrt(5)), used by
          the canonical NeRF MLP.
      "kaiming_relu": weight ~ U(-sqrt(6/fan_in), sqrt(6/fan_in)), bias 0 —
          used by the bending/rigidity hidden layers
          (reference: run_nerf_helpers.py:444-449).
      "zeros": zero weight (and bias) — the bending/rigidity output layers.
      "siren_first"/"siren": SIREN uniform ranges U(-1/fan_in, 1/fan_in) for
          the first layer and U(-sqrt(6/fan_in), sqrt(6/fan_in)) after,
          matching the reference's dormant sin branch
          (reference: run_nerf_helpers.py:434-443).
    """
    wkey, bkey = jax.random.split(key)
    if init == "torch_default":
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound) \
            if use_bias else None
    elif init == "kaiming_relu":
        bound = math.sqrt(6.0 / fan_in)
        w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
        b = jnp.zeros((fan_out,), dtype) if use_bias else None
    elif init == "siren_first":
        bound = 1.0 / fan_in
        w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
        b = jnp.zeros((fan_out,), dtype) if use_bias else None
    elif init == "siren":
        bound = math.sqrt(6.0 / fan_in)
        w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
        b = jnp.zeros((fan_out,), dtype) if use_bias else None
    elif init == "zeros":
        w = jnp.zeros((fan_in, fan_out), dtype)
        b = jnp.zeros((fan_out,), dtype) if use_bias else None
    else:
        raise ValueError(f"unknown init {init!r}")
    layer = {"w": w}
    if use_bias:
        layer["b"] = b
    return layer


def dense_apply(layer, x, compute_dtype=None):
    """y = x @ w + b, accumulating in float32 on the MXU.

    With a low-precision compute_dtype (bf16), the OUTPUT is cast back to
    that dtype as well: the hot path is HBM-bandwidth-bound on activation
    traffic, so keeping inter-layer activations bf16 halves the bytes moved
    (params and the final layer output stay f32).
    """
    w = layer["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in layer:
        y = y + layer["b"].astype(y.dtype)
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        y = y.astype(compute_dtype)
    return y
