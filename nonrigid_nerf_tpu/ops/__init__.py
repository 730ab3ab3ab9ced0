from nonrigid_nerf_tpu.ops.embedding import fourier_embed, make_embedder
from nonrigid_nerf_tpu.ops.rays import get_rays, pixel_rays, ndc_rays
from nonrigid_nerf_tpu.ops.sampling import stratified_z_vals, sample_pdf
from nonrigid_nerf_tpu.ops.compositing import raw2outputs
from nonrigid_nerf_tpu.ops.math import img2mse, mse2psnr, to8b, safe_norm

__all__ = [
    "fourier_embed", "make_embedder", "get_rays", "pixel_rays", "ndc_rays",
    "stratified_z_vals", "sample_pdf", "raw2outputs",
    "img2mse", "mse2psnr", "to8b", "safe_norm",
]
