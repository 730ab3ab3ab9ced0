"""Static FLOP accounting (utils/flops.py): hand-computed goldens for the
default architecture, and consistency across config variants."""

import dataclasses

from nonrigid_nerf_tpu.config import ModelConfig
from nonrigid_nerf_tpu.utils.flops import (bender_flops, canonical_mlp_flops,
                                           device_bf16_peak_tflops,
                                           render_flops_per_ray,
                                           rigidity_flops,
                                           train_flops_per_ray)

DEFAULT = ModelConfig()


def test_canonical_mlp_golden():
    # 63->256, 3x 256->256, skip@4: 319->256, 3x 256->256, out 256->5
    expected = 2 * (63 * 256 + 6 * 256 * 256 + 319 * 256 + 256 * 5)
    assert canonical_mlp_flops(DEFAULT, "coarse") == expected
    assert canonical_mlp_flops(DEFAULT, "fine") == expected


def test_bender_and_rigidity_golden():
    # bend: 35->64, 3x 64->64, 64->3 ; rigidity: 3->32, 32->32, 32->1
    assert bender_flops(DEFAULT) == 2 * (35 * 64 + 3 * 64 * 64 + 64 * 3)
    assert rigidity_flops(DEFAULT) == 2 * (3 * 32 + 32 * 32 + 32 * 1)
    off = dataclasses.replace(DEFAULT, ray_bending=None)
    assert bender_flops(off) == 0 and rigidity_flops(off) == 0


def test_render_flops_counts_passes():
    # 64 coarse + 128 fine canonical queries; 128 distinct bends (reuse)
    c = canonical_mlp_flops(DEFAULT, "coarse")
    b = bender_flops(DEFAULT) + rigidity_flops(DEFAULT)
    assert render_flops_per_ray(DEFAULT) == 128 * b + 64 * c + 128 * c
    # without reuse the fine pass re-bends the full sorted union
    no_reuse = dataclasses.replace(DEFAULT, stage1_reuse=False)
    assert render_flops_per_ray(no_reuse) == (64 + 128) * b + 192 * c


def test_train_flops_structure():
    fwd = render_flops_per_ray(DEFAULT)
    div = 64 * 2 * bender_flops(DEFAULT)
    assert train_flops_per_ray(DEFAULT) == 3 * (fwd + div)
    assert train_flops_per_ray(DEFAULT, divergence_weight=0.0) == 3 * fwd
    # exact divergence: 3 probes
    assert train_flops_per_ray(DEFAULT, divergence_exact=True) \
        == 3 * (fwd + 3 * div)
    # headline magnitude: ~190 MFLOP forward per ray at defaults (the
    # 192-query 8x256 chain), x3 for training plus the divergence re-bend
    assert 5.5e8 < train_flops_per_ray(DEFAULT) < 6.5e8


def test_viewdirs_variants_add_work():
    fd = dataclasses.replace(DEFAULT, use_viewdirs=True)
    exact = dataclasses.replace(fd, approx_nonrigid_viewdirs=False)
    assert render_flops_per_ray(fd) > render_flops_per_ray(DEFAULT)
    # exact adds one 2x-bender jvp per distinct queried point
    assert render_flops_per_ray(exact) == render_flops_per_ray(fd) \
        + 128 * 2 * bender_flops(DEFAULT)


def test_time_conditioned_baseline_widens_input():
    base = dataclasses.replace(DEFAULT, ray_bending=None,
                               time_conditioned_baseline=True)
    plain = dataclasses.replace(DEFAULT, ray_bending=None)
    assert canonical_mlp_flops(base) > canonical_mlp_flops(plain)


def test_peak_lookup():
    class FakeDev:
        device_kind = "TPU v5 lite"
    assert device_bf16_peak_tflops(FakeDev()) == 197.0

    class Cpu:
        device_kind = "cpu"
    assert device_bf16_peak_tflops(Cpu()) is None
