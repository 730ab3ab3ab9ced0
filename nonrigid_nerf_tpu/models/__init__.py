from nonrigid_nerf_tpu.models.mlp import dense_init, dense_apply
from nonrigid_nerf_tpu.models.bending import (
    init_bending_params, bend_points, rigidity_mask_fn)
from nonrigid_nerf_tpu.models.nerf import init_nerf_params, nerf_mlp_apply

__all__ = [
    "dense_init", "dense_apply",
    "init_bending_params", "bend_points", "rigidity_mask_fn",
    "init_nerf_params", "nerf_mlp_apply",
]
