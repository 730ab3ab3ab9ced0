"""Native JAX LPIPS: pipeline parity against an independent torch
implementation, weight-file handling, and metric sanity.

Pretrained AlexNet weights cannot be downloaded in this environment, so the
parity tests validate the *pipeline* bit-for-bit semantics with random
weights in the exact npz schema; real weights are a drop-in file (see
tools/convert_lpips_weights.py)."""

import os

import numpy as np
import pytest

from nonrigid_nerf_tpu.utils import lpips_jax


def make_random_weights(seed=0):
    rng = np.random.RandomState(seed)
    weights = {}
    for key, shape in lpips_jax.weight_spec().items():
        if key.startswith("lin"):
            weights[key] = rng.rand(*shape).astype(np.float32) * 0.1
        elif key.endswith("_b"):
            weights[key] = (0.01 * rng.randn(*shape)).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            weights[key] = (rng.randn(*shape) / np.sqrt(fan_in)).astype(
                np.float32)
    return weights


def torch_lpips_reference(img_a, img_b, weights):
    """Independent torch formulation of the same pipeline
    (lpips.LPIPS(net='alex') semantics)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188])
    scale = torch.tensor([0.458, 0.448, 0.450])

    def prep(img):
        x = 2.0 * torch.from_numpy(np.asarray(img, np.float32)) - 1.0
        x = (x - shift) / scale
        return x.permute(2, 0, 1).unsqueeze(0)

    convs = [(4, 2, False), (1, 2, True), (1, 1, True), (1, 1, False),
             (1, 1, False)]

    def taps(x):
        out = []
        h = x
        for i, (stride, pad, pool_before) in enumerate(convs):
            if pool_before:
                h = F.max_pool2d(h, kernel_size=3, stride=2)
            h = F.relu(F.conv2d(
                h, torch.from_numpy(weights[f"conv{i}_w"]),
                torch.from_numpy(weights[f"conv{i}_b"]),
                stride=stride, padding=pad))
            out.append(h)
        return out

    with torch.no_grad():
        ta, tb = taps(prep(img_a)), taps(prep(img_b))
        total = 0.0
        for i, (fa, fb) in enumerate(zip(ta, tb)):
            na = fa / (fa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb).pow(2)
            lin = torch.from_numpy(weights[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + (diff * lin).sum(dim=1).mean()
    return float(total)


@pytest.fixture()
def weight_file(tmp_path, monkeypatch):
    weights = make_random_weights()
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **weights)
    monkeypatch.setenv("NRN_LPIPS_WEIGHTS", str(path))
    lpips_jax.reset_cache()
    yield weights
    lpips_jax.reset_cache()


class TestLpipsPipeline:
    def test_matches_independent_torch_implementation(self, weight_file):
        rng = np.random.RandomState(1)
        a = rng.rand(64, 72, 3).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(64, 72, 3), 0, 1).astype(np.float32)
        got = lpips_jax.lpips_alex(a, b)
        want = torch_lpips_reference(a, b, weight_file)
        assert got is not None
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_identity_is_zero_and_orders_degradations(self, weight_file):
        rng = np.random.RandomState(2)
        img = rng.rand(64, 64, 3).astype(np.float32)
        assert lpips_jax.lpips_alex(img, img) == pytest.approx(0.0, abs=1e-6)
        slightly = np.clip(img + 0.02 * rng.randn(*img.shape), 0, 1)
        heavily = np.clip(img + 0.4 * rng.randn(*img.shape), 0, 1)
        d1 = lpips_jax.lpips_alex(img, slightly.astype(np.float32))
        d2 = lpips_jax.lpips_alex(img, heavily.astype(np.float32))
        assert 0.0 < d1 < d2

    def test_metrics_entrypoint_uses_native_pipeline(self, weight_file):
        from nonrigid_nerf_tpu.utils.metrics import lpips_distance
        rng = np.random.RandomState(3)
        a = rng.rand(48, 48, 3).astype(np.float32)
        b = rng.rand(48, 48, 3).astype(np.float32)
        d = lpips_distance(a, b)
        assert d is not None and np.isfinite(d) and d > 0

    def test_missing_weights_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setenv("NRN_LPIPS_WEIGHTS",
                           str(tmp_path / "nonexistent.npz"))
        # hide any repo/user weight files from the fallback search
        monkeypatch.setattr(lpips_jax, "_candidate_paths",
                            lambda: iter([str(tmp_path / "nonexistent.npz")]))
        lpips_jax.reset_cache()
        a = np.zeros((32, 32, 3), np.float32)
        assert lpips_jax.lpips_alex(a, a) is None
        lpips_jax.reset_cache()

    def test_bad_weight_file_is_rejected(self, tmp_path):
        path = tmp_path / "bad.npz"
        np.savez(path, conv0_w=np.zeros((2, 2)))
        with pytest.raises(ValueError):
            lpips_jax.load_weights(str(path))
