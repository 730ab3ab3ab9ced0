"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

import jax
import pytest

# The axon TPU plugin can override JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_DIR / "run_nerf_helpers.py").exists()


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference implementation not mounted at /root/reference")


@pytest.fixture(scope="session")
def reference_helpers():
    """Import the reference's run_nerf_helpers (torch CPU) for behavioral
    parity tests. Untrusted third-party code: used only to compare numerical
    outputs."""
    if not reference_available():
        pytest.skip("no reference")
    # append (not insert) so reference modules never shadow same-named repo
    # modules like preprocess.py / train.py
    if str(REFERENCE_DIR) not in sys.path:
        sys.path.append(str(REFERENCE_DIR))
    import run_nerf_helpers  # noqa
    return run_nerf_helpers
