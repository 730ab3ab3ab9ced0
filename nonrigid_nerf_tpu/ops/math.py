"""Small math helpers (reference: run_nerf_helpers.py:10-19)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def img2mse(pred, target, n_rays: int):
    """Per-ray MSE: mean of squared error over each ray's channels,
    returned with shape (n_rays,) so reductions/masking happen at the caller
    (reference: run_nerf_helpers.py:10-13)."""
    se = (pred - target) ** 2
    return jnp.mean(se.reshape(n_rays, -1), axis=1)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x):
    return (255.0 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)


def safe_norm(v, axis=-1, keepdims=False, eps=0.0):
    """L2 norm with a well-defined zero gradient at v = 0.

    The ray-bending offsets are exactly zero at initialization (zero-init
    final layer, reference: run_nerf_helpers.py:451-454), and the offsets loss
    takes ||offset||^(2-rigidity) (reference: train.py:223-227). PyTorch
    defines the subgradient of the norm at 0 as 0; naive jnp.linalg.norm
    would produce NaN there. The double-where trick keeps both value and
    gradient finite.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    is_zero = sq <= eps
    sq_safe = jnp.where(is_zero, jnp.ones_like(sq), sq)
    return jnp.where(is_zero, jnp.zeros_like(sq), jnp.sqrt(sq_safe))


def safe_pow(base, exponent, eps: float = 1e-9):
    """base**exponent with finite gradients for base >= 0, including base = 0.

    Used for ||offset||^(2-rigidity): the exponent is a function of the
    learnable rigidity mask, and d/dp x^p = x^p ln(x) diverges at x = 0.
    Clamping the base to eps keeps the exponent gradient ~0 there (the true
    limit) while leaving values for base >= eps untouched.
    """
    return jnp.power(jnp.maximum(base, eps), exponent)
