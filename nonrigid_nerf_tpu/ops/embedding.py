"""Fourier positional encoding (NeRF section 5.1).

Behavioral contract (reference: run_nerf_helpers.py:120-168): the output is
[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ..., sin(2^{L-1} x),
cos(2^{L-1} x)] concatenated on the last axis.  `include_input=True` is
load-bearing: the ray-bending network reads the raw xyz from the first three
channels (reference: run_nerf_helpers.py:517-519).

TPU notes: implemented as one broadcasted multiply + sin/cos over a
(..., L, d) intermediate; XLA fuses this into the consuming matmul so the
encoding never round-trips HBM.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def fourier_embed(x, num_freqs: int, include_input: bool = True,
                  log_sampling: bool = True):
    """Positionally encode `x` (..., d) -> (..., d * (include + 2*num_freqs)).

    Frequencies are 2^0 .. 2^(num_freqs-1) for log sampling (matching the
    reference's `torch.linspace(0, multires-1, multires)` exponents).
    """
    if num_freqs == 0:
        return x
    dtype = x.dtype
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=dtype)
    else:
        freqs = jnp.linspace(2.0 ** 0.0, 2.0 ** (num_freqs - 1), num_freqs,
                             dtype=dtype)
    xb = x[..., None, :] * freqs[:, None]            # (..., L, d)
    # interleave sin/cos per frequency to match the reference channel order:
    # [sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., L, 2, d)
    sc = sc.reshape(x.shape[:-1] + (num_freqs * 2 * x.shape[-1],))
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def make_embedder(multires: int, i_embed: int = 0, input_dims: int = 3):
    """Return (embed_fn, out_dim) mirroring the reference get_embedder
    (reference: run_nerf_helpers.py:153-168)."""
    if i_embed == -1:
        return (lambda x: x), input_dims
    out_dim = input_dims * (1 + 2 * multires)
    return functools.partial(fourier_embed, num_freqs=multires,
                             include_input=True, log_sampling=True), out_dim
