"""Stratified and hierarchical (inverse-CDF) sampling along rays.

Behavioral contract (reference: train.py:847-869 for the stratified pass,
run_nerf_helpers.py:651-698 for `sample_pdf`).

TPU-first design difference: the reference inverts the CDF with
`torch.searchsorted` + gather. Here the interval search is expressed as a
masked max/min reduction over a broadcast comparison (the jaxnerf pattern):
XLA fuses the compare with the reduction, so nothing of the (rays, bins,
samples) intermediate is materialized in HBM, and there is no data-dependent
control flow — ideal for the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(key, near, far, n_rays: int, n_samples: int,
                      lindisp: bool = False, perturb: float = 0.0,
                      dtype=jnp.float32):
    """Depths of the coarse samples: linear in depth (or disparity) with
    optional per-ray jitter within each bin (reference: train.py:847-869)."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    near = jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def _gather_intervals(mask, values):
    """For each query, the bracketing (below, above) values.

    mask: (..., n_bins, n_queries) — True where cdf[bin] <= u[query].
    values: (..., n_bins).
    Returns (below, above): each (..., n_queries).
    """
    v = values[..., :, None]
    below = jnp.max(jnp.where(mask, v, values[..., :1, None]), axis=-2)
    above = jnp.min(jnp.where(~mask, v, values[..., -1:, None]), axis=-2)
    return below, above


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF importance sampling of `n_samples` new depths per ray.

    bins:    (..., n_bins) sorted bin positions (coarse z midpoints).
    weights: (..., n_bins - 1) unnormalized visibility weights.

    Matches the reference semantics (run_nerf_helpers.py:651-698): +1e-5 on
    weights, CDF prefixed with 0, deterministic linspace or uniform draws,
    linear interpolation within the bracketing CDF interval, degenerate
    intervals (denom < 1e-5) treated as width 1.
    """
    dtype = weights.dtype
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (..., n_bins)

    batch_shape = cdf.shape[:-1]
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
        u = jnp.broadcast_to(u, batch_shape + (n_samples,))
    else:
        u = jax.random.uniform(key, batch_shape + (n_samples,), dtype=dtype)

    # torch.searchsorted(cdf, u, right=False) returns the first index with
    # cdf[idx] >= u; `below` = idx-1 clamped, `above` = idx clamped. The
    # bracketing lower edge is therefore the largest bin with cdf
    # STRICTLY < u — on a tie (cdf[i] == u) searchsorted returns i, so
    # below = i-1, which the strict `<` mask reproduces. The
    # masked-reduction below yields exactly the gathered (cdf_g, bins_g)
    # pairs of the reference's (max(idx-1, 0), idx) gather.
    mask = cdf[..., :, None] < u[..., None, :]           # (..., n_bins, S)
    cdf_below, cdf_above = _gather_intervals(mask, cdf)
    bins_below, bins_above = _gather_intervals(mask, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return jax.lax.stop_gradient(samples)
