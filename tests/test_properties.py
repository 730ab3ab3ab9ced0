"""Property-based invariants of the core ops (hypothesis).

Complements the golden-value/parity tests: random weights/depths/densities
must never break the mathematical contracts the renderer relies on —
importance samples stay inside the bin range and sorted draws stay
monotone, stratified depths cover [near, far] monotonically, and the
compositing weights form a sub-probability-measure whose residual is the
transmittance the accumulation map reports.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from nonrigid_nerf_tpu.ops.compositing import raw2outputs
from nonrigid_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals

# module-scoped deadline=None: first jit of each op compiles under hypothesis
COMMON = dict(deadline=None, max_examples=25)


@settings(**COMMON)
@given(seed=st.integers(0, 2 ** 31 - 1),
       n_bins=st.integers(3, 33),
       n_samples=st.integers(1, 65),
       det=st.booleans(),
       spiky=st.booleans())
def test_sample_pdf_stays_in_range(seed, n_bins, n_samples, det, spiky):
    rng = np.random.RandomState(seed)
    bins = np.sort(rng.rand(4, n_bins).astype(np.float32) * 5.0, axis=-1)
    w = rng.rand(4, n_bins - 1).astype(np.float32)
    if spiky:
        w = np.zeros_like(w)
        w[:, rng.randint(n_bins - 1)] = 1000.0   # near-degenerate CDF
    z = np.asarray(sample_pdf(jax.random.PRNGKey(seed), jnp.asarray(bins),
                              jnp.asarray(w), n_samples, det=det))
    assert np.all(np.isfinite(z))
    assert np.all(z >= bins[:, :1] - 1e-5)
    assert np.all(z <= bins[:, -1:] + 1e-5)
    if det and n_samples > 1:
        # deterministic linspace draws produce sorted outputs
        assert np.all(np.diff(z, axis=-1) >= -1e-6)


@settings(**COMMON)
@given(seed=st.integers(0, 2 ** 31 - 1),
       n_samples=st.integers(2, 96),
       lindisp=st.booleans(),
       perturb=st.sampled_from([0.0, 1.0]))
def test_stratified_z_vals_cover_near_far(seed, n_samples, lindisp, perturb):
    near, far = 0.5, 7.0
    key = jax.random.PRNGKey(seed) if perturb else None
    z = np.asarray(stratified_z_vals(key, near, far, 6, n_samples,
                                     lindisp=lindisp, perturb=perturb))
    assert z.shape == (6, n_samples)
    assert np.all(np.isfinite(z))
    assert np.all(z >= near - 1e-5) and np.all(z <= far + 1e-5)
    assert np.all(np.diff(z, axis=-1) >= -1e-6)          # monotone
    if not perturb:
        np.testing.assert_allclose(z[:, 0], near, atol=1e-5)
        np.testing.assert_allclose(z[:, -1], far, rtol=1e-5)


@settings(**COMMON)
@given(seed=st.integers(0, 2 ** 31 - 1),
       n_samples=st.integers(2, 64),
       scale=st.sampled_from([0.1, 1.0, 50.0]))
def test_raw2outputs_is_sub_probability(seed, n_samples, scale):
    rng = np.random.RandomState(seed)
    raw = jnp.asarray((rng.randn(5, n_samples, 4) * scale).astype(np.float32))
    z = jnp.asarray(np.sort(rng.rand(5, n_samples).astype(np.float32) * 4
                            + 1.0, axis=-1))
    rays_d = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    out = raw2outputs(raw, z, rays_d)
    w = np.asarray(out.visibility_weights)
    acc = np.asarray(out.acc_map)
    rgb = np.asarray(out.rgb_map)
    assert np.all(np.isfinite(w)) and np.all(w >= 0.0)
    np.testing.assert_allclose(w.sum(-1), acc, atol=1e-4)
    assert np.all(acc <= 1.0 + 1e-5)
    # rgb is a weighted average of sigmoids => inside [0, acc]
    assert np.all(rgb >= -1e-5) and np.all(rgb <= acc[:, None] + 1e-4)
    assert np.all(np.isfinite(np.asarray(out.disp_map)))


# ---------------------------------------------------------------------------
# Checkpoint formats: any nested pytree of arrays (dicts / lists / tuples /
# namedtuples) must round-trip EXACTLY, and the npz and orbax backends must
# agree leaf-for-leaf (they share the flatten layer).
# ---------------------------------------------------------------------------

import collections
import os

_NT = collections.namedtuple("_NT", ["mu", "nu"])


def _random_tree(rng, depth):
    kind = rng.randint(0, 5) if depth > 0 else 4
    if kind == 0:
        return {f"k{i}": _random_tree(rng, depth - 1)
                for i in range(rng.randint(1, 3))}
    if kind == 1:
        return [_random_tree(rng, depth - 1)
                for _ in range(rng.randint(1, 3))]
    if kind == 2:
        return tuple(_random_tree(rng, depth - 1)
                     for _ in range(rng.randint(1, 3)))
    if kind == 3:
        return _NT(_random_tree(rng, depth - 1),
                   _random_tree(rng, depth - 1))
    dtype = [np.float32, np.float64, np.int32][rng.randint(0, 3)]
    shape = tuple(rng.randint(1, 4) for _ in range(rng.randint(0, 3)))
    return np.asarray(100 * rng.randn(*shape)).astype(dtype)


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(x, y)


@settings(deadline=None, max_examples=10)
@given(seed=st.integers(0, 2 ** 31 - 1))
def test_checkpoint_formats_roundtrip_any_pytree(seed, tmp_path_factory):
    import pytest as _pytest
    _pytest.importorskip("orbax.checkpoint")
    from nonrigid_nerf_tpu.checkpoints import (load_checkpoint,
                                               save_checkpoint)
    rng = np.random.RandomState(seed)
    params = {"tree": _random_tree(rng, 3)}
    opt = _NT(_random_tree(rng, 2), _random_tree(rng, 2))
    extras = {"near": float(rng.rand()), "tags": ["a", "b"]}
    tmp = tmp_path_factory.mktemp("ckpt_prop")
    out = {}
    for ext in ("npz", "orbax"):
        path = os.path.join(tmp, f"c.{ext}")
        save_checkpoint(path, 7, params, opt, extras)
        step, p, o, e = load_checkpoint(path)
        assert step == 7 and e == extras
        _leaves_equal(p, params)
        _leaves_equal(o, opt)
        out[ext] = (p, o)
    _leaves_equal(out["npz"][0], out["orbax"][0])
    _leaves_equal(out["npz"][1], out["orbax"][1])
