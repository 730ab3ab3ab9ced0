"""Serving-export tests: the StableHLO artifact must reproduce the live
renderer exactly and stay loadable with nothing but jax."""

import os

import jax
import numpy as np
import pytest

from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.engine.render import render_rays
from nonrigid_nerf_tpu.engine.train_state import create_train_state
from nonrigid_nerf_tpu.serving import (export_renderer, load_exported,
                                       make_serving_fn, render_many,
                                       save_exported)

TINY = ModelConfig(netdepth=2, netwidth=32, netdepth_fine=2,
                   netwidth_fine=32, multires=4, N_samples=4,
                   N_importance=4, fused_kernel="off")
RS = RenderSettings(N_samples=4, N_importance=4, near=2.0, far=6.0)
CHUNK = 64


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    params = create_train_state(jax.random.PRNGKey(0), TINY, TrainConfig(),
                                3).params
    blob, meta = export_renderer(params, TINY, RS, chunk=CHUNK)
    path = str(tmp_path_factory.mktemp("serve") / "model.stablehlo")
    save_exported(path, blob, meta)
    return params, path


def _rays(n):
    rng = np.random.RandomState(3)
    rays_o = 0.1 * rng.randn(n, 3).astype(np.float32)
    rays_d = rng.randn(n, 3).astype(np.float32)
    rays_d[:, 2] -= 2.0
    latents = 0.05 * rng.randn(n, 32).astype(np.float32)
    return rays_o, rays_d, latents


def test_artifact_matches_live_renderer(artifact):
    params, path = artifact
    render, meta = load_exported(path)
    rays_o, rays_d, latents = _rays(CHUNK)
    got = render(rays_o, rays_d, latents)
    want = make_serving_fn(params, TINY, RS)(rays_o, rays_d, latents)
    assert set(got.keys()) == {"rgb_map", "disp_map", "acc_map"}
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), rtol=1e-6,
                                   atol=1e-6)
    # live path sanity: the serving fn equals raw render_rays in test mode
    direct = render_rays(params, TINY, RS.test_mode(), rays_o, rays_d,
                         latents, key=None)
    np.testing.assert_allclose(np.asarray(want["rgb_map"]),
                               np.asarray(direct["rgb_map"]), rtol=1e-6)


def test_meta_is_self_describing(artifact):
    params, path = artifact
    _, meta = load_exported(path)
    assert meta["chunk"] == CHUNK
    assert meta["latent_size"] == 32
    table = np.asarray(meta["latent_table"], np.float32)
    np.testing.assert_array_equal(table, np.asarray(params["latents"]))
    assert meta["near"] == 2.0 and meta["far"] == 6.0


def test_artifact_needs_only_jax(artifact):
    """Deserialization + call through jax.export alone (the deployment
    path: no package imports)."""
    _, path = artifact
    from jax import export as jax_export
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    rays_o, rays_d, latents = _rays(CHUNK)
    out = exported.call(rays_o, rays_d, latents)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))


def test_render_many_pads_and_strips(artifact):
    """Arbitrary ray counts through the fixed-block artifact: the padded
    tail must not leak into the results."""
    params, path = artifact
    render, meta = load_exported(path)
    n = CHUNK + 17
    rays_o, rays_d, latents = _rays(n)
    got = render_many(render, meta["chunk"], rays_o, rays_d, latents)
    want = make_serving_fn(params, TINY, RS)(rays_o, rays_d, latents)
    for k in got:
        assert got[k].shape[0] == n
        np.testing.assert_allclose(got[k], np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6)


def test_viewdirs_model_exports(tmp_path):
    """The viewdirs family exports through the same path."""
    import dataclasses
    cfg = dataclasses.replace(TINY, use_viewdirs=True)
    params = create_train_state(jax.random.PRNGKey(2), cfg, TrainConfig(),
                                2).params
    blob, meta = export_renderer(params, cfg, RS, chunk=16)
    path = os.path.join(tmp_path, "vd.stablehlo")
    save_exported(path, blob, meta)
    render, _ = load_exported(path)
    rays_o, rays_d, latents = _rays(16)
    got = render(rays_o, rays_d, latents)
    want = make_serving_fn(params, cfg, RS)(rays_o, rays_d, latents)
    np.testing.assert_allclose(np.asarray(got["rgb_map"]),
                               np.asarray(want["rgb_map"]), rtol=1e-6,
                               atol=1e-6)


def test_cross_platform_lowering(tmp_path):
    """One artifact can carry cpu AND tpu lowerings (the XLA-only path has
    no TPU-only custom calls)."""
    params = create_train_state(jax.random.PRNGKey(1), TINY, TrainConfig(),
                                2).params
    blob, meta = export_renderer(params, TINY, RS, chunk=16,
                                 platforms=("cpu", "tpu"))
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    path = os.path.join(tmp_path, "multi.stablehlo")
    save_exported(path, blob, meta)
    render, _ = load_exported(path)
    rays_o, rays_d, latents = _rays(16)
    out = render(rays_o, rays_d, latents)  # runs on the cpu lowering here
    assert np.asarray(out["rgb_map"]).shape == (16, 3)
