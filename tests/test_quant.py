"""Int8 post-training-quantized inference: parity with the f32 path.

Runs in Pallas interpreter mode on CPU. The int8 kernel quantizes weights
per output channel and activations with per-layer static scales, so parity
tolerances are int8-step-level (~0.5-1% of each layer's dynamic range),
checked against the f32 XLA path end to end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import nonrigid_nerf_tpu.ops.pallas.quant_mlp as qmlp
from nonrigid_nerf_tpu.config import ModelConfig, RenderSettings, TrainConfig
from nonrigid_nerf_tpu.models import init_bending_params, init_nerf_params
from nonrigid_nerf_tpu.models.nerf import nerf_mlp_apply


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(qmlp.pl, "pallas_call", patched)


CFG = ModelConfig()


def make_params(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {"coarse": init_nerf_params(ks[0], CFG),
            "fine": init_nerf_params(ks[1], CFG),
            "bender": init_bending_params(ks[2], CFG)}


class TestInt8Kernel:
    def test_forward_close_to_f32(self):
        params = make_params()
        rng = np.random.RandomState(0)
        n = 1024
        emb = jnp.asarray(
            np.clip(rng.randn(n, 63), -1.5, 1.5).astype(np.float32))
        scales = qmlp.calibrate_act_scales(params, emb)
        assert scales.shape == (9,) and bool(jnp.all(scales > 0))
        qw = qmlp.pack_int8_mlp_weights(params, scales)
        raw_q = qmlp.mlp_i8_core(jnp.pad(emb, ((0, 0), (0, 1))), qw, 512)
        raw_f = nerf_mlp_apply(params["coarse"], CFG, emb, None)
        err = np.abs(np.asarray(raw_q[:, :4]) - np.asarray(raw_f))
        scale = np.abs(np.asarray(raw_f)).mean() + 1e-9
        assert err.mean() / scale < 0.02, (err.mean(), scale)

    def test_add_quant_scales_covers_both_networks(self):
        params = make_params()
        rng = np.random.RandomState(1)
        emb = jnp.asarray(rng.randn(256, 63).astype(np.float32))
        p2 = qmlp.add_quant_scales(params, emb)
        assert set(p2["quant"]) == {"coarse", "fine"}
        assert params is not p2 and "quant" not in params
        # the int8 weight tuple is prepacked at calibration time (not
        # re-rounded inside the renderer's chunk loop)...
        leaf = p2["quant"]["coarse"]
        assert len(leaf["packed"]) == qmlp.N_QW + 1
        packed = qmlp.packed_int8_weights(leaf, p2, "coarse", 10)
        # ...and old checkpoint-era leaves holding only the (9,) scales
        # array still resolve through on-the-fly packing
        legacy = qmlp.packed_int8_weights(leaf["scales"], p2, "coarse", 10)
        for a, b in zip(packed, legacy):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quantize_for_inference_end_to_end_render(self, monkeypatch):
        """make_ray_renderer with fused_kernel='int8' matches the f32
        renderer to int8-level tolerance on random-init params. The int8
        predicate requires a TPU backend (CPU pallas is interpret-only), so
        the backend probe is forced here; the autouse fixture already puts
        the kernel itself in interpret mode."""
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        from nonrigid_nerf_tpu.engine.render import make_ray_renderer

        params = make_params(3)
        rng = np.random.RandomState(3)
        R = 40
        rays_o = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
        rays_d = rng.randn(R, 3).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_d = jnp.asarray(rays_d)
        lat = jnp.asarray(0.05 * rng.randn(R, 32).astype(np.float32))
        rs = RenderSettings(near=0.5, far=2.5, N_samples=16,
                            N_importance=8).test_mode()

        params_q = qmlp.quantize_for_inference(
            params, CFG, rays_o, rays_d, lat, 0.5, 2.5, n_rays=16,
            n_samples=16)
        assert "quant" in params_q

        cfg_q = dataclasses.replace(CFG, fused_kernel="int8")
        r_q = make_ray_renderer(cfg_q, rs, chunk=64)
        # the forced-"tpu" backend probe would also flip "auto" on; pin the
        # reference renderer to the XLA path
        r_f = make_ray_renderer(dataclasses.replace(CFG, fused_kernel="off"),
                                rs, chunk=64)
        out_q = r_q(params_q, rays_o, rays_d, lat, None)
        out_f = r_f(params, rays_o, rays_d, lat, None)
        rgb_q = np.asarray(out_q["rgb_map"])
        rgb_f = np.asarray(out_f["rgb_map"])
        assert np.all(np.isfinite(rgb_q))
        assert np.abs(rgb_q - rgb_f).mean() < 0.02

    def test_int8_viewdirs_falls_back_to_xla(self):
        """int8 covers the no-viewdirs MLP; a viewdirs config silently uses
        the XLA path instead of erroring."""
        from nonrigid_nerf_tpu.config import EditConfig
        from nonrigid_nerf_tpu.engine.query import _use_fused_kernel
        cfg = dataclasses.replace(CFG, fused_kernel="int8",
                                  use_viewdirs=True)
        assert not _use_fused_kernel(cfg, EditConfig())

    def test_train_step_rejects_int8(self):
        from nonrigid_nerf_tpu.engine.train_step import make_train_step
        cfg = dataclasses.replace(CFG, fused_kernel="int8")
        with pytest.raises(ValueError, match="inference-only"):
            make_train_step(cfg, TrainConfig(), RenderSettings(near=0.0,
                            far=1.0), has_test_split=False)
