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
