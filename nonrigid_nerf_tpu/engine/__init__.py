from nonrigid_nerf_tpu.engine.query import query_points
from nonrigid_nerf_tpu.engine.render import render_rays, make_ray_renderer
from nonrigid_nerf_tpu.engine.losses import (
    per_ray_losses, offsets_and_rigidity_loss, divergence_loss,
    loss_schedule_factor)

__all__ = [
    "query_points", "render_rays", "make_ray_renderer",
    "per_ray_losses", "offsets_and_rigidity_loss", "divergence_loss",
    "loss_schedule_factor",
]
