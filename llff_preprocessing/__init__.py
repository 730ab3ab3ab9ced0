"""API-parity shim: the reference imports `gen_poses` from this package
(reference: preprocess.py:334-336). The real implementation lives in
nonrigid_nerf_tpu.preprocessing."""

from llff_preprocessing.pose_utils import gen_poses

__all__ = ["gen_poses"]
