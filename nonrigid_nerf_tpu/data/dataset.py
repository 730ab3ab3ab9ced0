"""Device-resident ray dataset.

TPU-first replacement for the reference's host-side
[N, H, W, ro+rd+rgb+idx, 3] float tensor + per-iteration numpy sampling +
host->GPU copy (reference: train.py:1498-1564). Here the device holds only
the uint8 image stack (~50 MB for the example sequence instead of ~600 MB of
precomputed rays) plus tiny pose/intrinsics/id tables; pixel sampling, ray
generation, and latent lookup all happen inside the jitted train step, so the
hot loop never touches the host.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from nonrigid_nerf_tpu.ops.rays import pixel_rays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayDataset:
    """All device arrays the train step needs. A pytree (H/W/near/far are
    static metadata)."""

    images: jax.Array          # (N, H, W, 3) uint8
    poses: jax.Array           # (N, 3, 4) float32 camera-to-world
    # per-view intrinsics, indexed by viewid: (V, 4) = fx, fy, cx, cy
    view_intrinsics: jax.Array
    imageid_to_viewid: jax.Array      # (N,) int32
    imageid_to_timestepid: jax.Array  # (N,) int32
    train_indicator: jax.Array        # (N,) float32 — 1 for training images
    test_indicator: jax.Array         # (N,) float32 — 1 for test images

    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    near: float = dataclasses.field(metadata=dict(static=True))
    far: float = dataclasses.field(metadata=dict(static=True))

    @property
    def num_images(self) -> int:
        return self.images.shape[0]


def build_ray_dataset(images: np.ndarray, poses: np.ndarray,
                      intrinsics: Dict[int, dict], dataset_extras: dict,
                      i_train: np.ndarray, i_test: np.ndarray,
                      near: float, far: float) -> RayDataset:
    """Assemble the device-resident dataset from loader outputs."""
    n_images = images.shape[0]
    n_views = len(intrinsics)
    view_intrin = np.zeros((n_views, 4), np.float32)
    for viewid, cam in intrinsics.items():
        view_intrin[viewid] = [cam["focal_x"], cam["focal_y"],
                               cam["center_x"], cam["center_y"]]

    train_ind = np.zeros((n_images,), np.float32)
    train_ind[np.asarray(i_train, np.int64)] = 1.0
    test_ind = np.zeros((n_images,), np.float32)
    if len(i_test):
        test_ind[np.asarray(i_test, np.int64)] = 1.0

    images_u8 = np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8) \
        if images.dtype != np.uint8 else images

    return RayDataset(
        images=jnp.asarray(images_u8),
        poses=jnp.asarray(poses[:, :3, :4], jnp.float32),
        view_intrinsics=jnp.asarray(view_intrin),
        imageid_to_viewid=jnp.asarray(
            dataset_extras["imageid_to_viewid"], jnp.int32),
        imageid_to_timestepid=jnp.asarray(
            dataset_extras["imageid_to_timestepid"], jnp.int32),
        train_indicator=jnp.asarray(train_ind),
        test_indicator=jnp.asarray(test_ind),
        height=int(images.shape[1]), width=int(images.shape[2]),
        num_timesteps=len(dataset_extras["raw_timesteps"]),
        near=float(near), far=float(far),
    )


def sample_ray_batch(key, ds: RayDataset, n_rand: int):
    """On-device random pixel sampling -> ray batch.

    Mirrors the reference's per-iteration numpy sampling of (image, x, y)
    triples over all images (reference: train.py:1546-1553), entirely on
    device.

    Returns dict with rays_o, rays_d (n_rand, 3), target_rgb (n_rand, 3),
    image_ids, timestep_ids (n_rand,), train_indicator, test_indicator.
    """
    k_img, k_x, k_y = jax.random.split(key, 3)
    image_ids = jax.random.randint(k_img, (n_rand,), 0, ds.num_images)
    x = jax.random.randint(k_x, (n_rand,), 0, ds.width)
    y = jax.random.randint(k_y, (n_rand,), 0, ds.height)

    # Flat row gather instead of 4D advanced indexing: the reshape is
    # layout-identical (row-major) so XLA aliases the buffer, and the
    # single-axis gather lowers ~4.5x faster on TPU than the 4D form at
    # large stack sizes (tools/gather_microbench.py; the 300-frame/720p
    # scale-envelope stack is 2.5 GB).
    flat = ds.images.reshape(-1, 3)
    lin = (image_ids * ds.height + y) * ds.width + x
    target = flat[lin].astype(jnp.float32) / 255.0

    c2w = ds.poses[image_ids]                          # (R, 3, 4)
    viewids = ds.imageid_to_viewid[image_ids]
    intrin = ds.view_intrinsics[viewids]               # (R, 4)
    rays_o, rays_d = pixel_rays(
        c2w, x.astype(jnp.float32), y.astype(jnp.float32),
        intrin[:, 0], intrin[:, 1], intrin[:, 2], intrin[:, 3])

    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "target_rgb": target,
        "image_ids": image_ids,
        "timestep_ids": ds.imageid_to_timestepid[image_ids],
        "train_indicator": ds.train_indicator[image_ids],
        "test_indicator": ds.test_indicator[image_ids],
    }
