"""nonrigid_nerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for Non-Rigid Neural
Radiance Fields (NR-NeRF, Tretschk et al., arXiv 2012.12247).

This is a from-scratch rebuild of the capabilities of facebookresearch/nonrigid_nerf,
designed TPU-first: device-resident ray datasets, a single fused jitted train step,
forward-mode (jvp) divergence regularizers, Pallas kernels for the embed->bend->MLP
point-query path, and shard_map data parallelism over ICI in place of
torch.nn.DataParallel.
"""

__version__ = "0.1.0"
