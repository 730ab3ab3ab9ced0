from nonrigid_nerf_tpu.utils.viz import (
    disparity_to_jet, disparity_to_blinn_phong, export_ray_bending_objs)
from nonrigid_nerf_tpu.utils.volume import determine_nerf_volume_extent

__all__ = ["disparity_to_jet", "disparity_to_blinn_phong",
           "export_ray_bending_objs", "determine_nerf_volume_extent"]
