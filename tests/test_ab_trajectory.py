"""Smoke test for the long-horizon A/B trajectory tool
(tools/ab_reference_trajectory.py): a few real optimization steps of BOTH
frameworks (the imported PyTorch reference and the production jitted step)
on real example_sequence data, identical init and batches, asserting the
trajectories track each other. The full-scale artifact lives in
results/r3_ab_trajectory/.
"""

import json
import os

import pytest

from tests.conftest import REFERENCE_DIR, requires_reference

pytest.importorskip("torch")


@requires_reference
def test_ab_trajectory_tool_smoke(tmp_path):
    if not (REFERENCE_DIR / "data" / "example_sequence"
            / "precomputed.json").exists():
        pytest.skip("no example_sequence data")
    from nonrigid_nerf_tpu.engine import train_step as ts_mod
    from nonrigid_nerf_tpu.engine import losses as losses_mod
    sampler_before = ts_mod.sample_ray_batch
    div_before = losses_mod.divergence_loss

    from tools.ab_reference_trajectory import run
    summary = run([
        "--steps", "4", "--frames", "3", "--factor", "16",
        "--n_rand", "48", "--n_samples", "8", "--n_importance", "8",
        "--eval_every", "4", "--probe_rays", "128", "--early_window", "4",
        "--out", str(tmp_path), "--no_plot",
    ])
    # typical step tracks to fp32 noise; occasional 1/pdf-amplified
    # outliers are covered by the (looser) max bound
    assert summary["early_median_rel_loss_gap"] < 1e-3
    assert summary["early_max_rel_loss_gap"] < 5e-2
    assert abs(summary["final_psnr_gap_db"]) < 0.05

    with open(os.path.join(tmp_path, "trajectory.json")) as f:
        art = json.load(f)
    assert len(art["loss_torch"]) == len(art["loss_jax"]) == 4
    assert len(art["evals"]) == 3  # steps 0 and 3, plus the final state

    # run() must leave no module-level patches behind (it swaps the
    # production batch sampler and the divergence estimator while running)
    assert ts_mod.sample_ray_batch is sampler_before
    assert losses_mod.divergence_loss is div_before


@requires_reference
def test_ab_trajectory_handover_mode(tmp_path):
    """--handover N: the reference trains alone for N steps, its tar is
    imported through interop, and the continued trajectories must track —
    the split-brain mid-training handover claim."""
    if not (REFERENCE_DIR / "data" / "example_sequence"
            / "precomputed.json").exists():
        pytest.skip("no example_sequence data")
    from tools.ab_reference_trajectory import run
    summary = run([
        "--steps", "6", "--handover", "3", "--frames", "3", "--factor", "16",
        "--n_rand", "48", "--n_samples", "8", "--n_importance", "8",
        "--eval_every", "3", "--probe_rays", "128", "--early_window", "3",
        "--out", str(tmp_path), "--no_plot",
    ])
    assert summary["handover"] == 3
    # the continued trajectories must track at the same f32 tolerance as
    # the from-init A/B (the import is bit-exact on params; Adam state maps
    # one-to-one)
    assert summary["early_median_rel_loss_gap"] < 1e-3
    assert summary["early_max_rel_loss_gap"] < 5e-2
    assert abs(summary["final_psnr_gap_db"]) < 0.05

    with open(os.path.join(tmp_path, "trajectory.json")) as f:
        art = json.load(f)
    assert len(art["loss_torch"]) == 6
    assert len(art["loss_jax"]) == 3   # continuation only


@requires_reference
def test_ab_trajectory_multiview_mode(tmp_path):
    """--multiview drives a calibration.json rig through both frameworks:
    per-view intrinsics and latent sharing across views within a timestep
    (reference: load_llff.py:36-73, train.py:1222-1322)."""
    from tools.make_multiview_dataset import main as make_ds
    ds_dir = str(tmp_path / "mv")
    make_ds(["--out", ds_dir, "--views", "2", "--timesteps", "3",
             "--height", "24", "--width", "32"])

    from tools.ab_reference_trajectory import run
    summary = run([
        "--steps", "4", "--multiview", ds_dir,
        "--n_rand", "48", "--n_samples", "8", "--n_importance", "8",
        "--eval_every", "4", "--probe_rays", "128", "--early_window", "4",
        "--out", str(tmp_path / "out"), "--no_plot",
    ])
    assert summary["config"]["multiview"] is True
    assert summary["config"]["num_latents"] == 3   # timesteps, not images
    assert summary["early_median_rel_loss_gap"] < 1e-3
    assert summary["early_max_rel_loss_gap"] < 5e-2
    assert abs(summary["final_psnr_gap_db"]) < 0.05


@requires_reference
def test_ab_trajectory_block_split_mode(tmp_path):
    """--test_frames engages the two-phase backward on both sides: the
    held-out probe must be reported and the trajectories must track."""
    if not (REFERENCE_DIR / "data" / "example_sequence"
            / "precomputed.json").exists():
        pytest.skip("no example_sequence data")
    from tools.ab_reference_trajectory import run
    summary = run([
        "--steps", "3", "--frames", "3", "--factor", "16",
        "--n_rand", "48", "--n_samples", "8", "--n_importance", "8",
        "--eval_every", "3", "--probe_rays", "96", "--early_window", "3",
        "--test_frames", "1", "--out", str(tmp_path), "--no_plot",
    ])
    assert summary["config"]["test_frames"] == 1
    assert summary["early_median_rel_loss_gap"] < 1e-3
    assert abs(summary["final_psnr_gap_db"]) < 0.05
    assert abs(summary["final_heldout_psnr_gap_db"]) < 0.05
    with open(os.path.join(tmp_path, "trajectory.json")) as f:
        art = json.load(f)
    assert len(art["evals_test"]) == len(art["evals"]) > 0
