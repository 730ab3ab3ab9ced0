from nonrigid_nerf_tpu.parallel import multihost
from nonrigid_nerf_tpu.parallel.mesh import (
    make_mesh, make_parallel_train_step, make_parallel_renderer,
    make_auto_renderer)

__all__ = ["make_mesh", "make_parallel_train_step", "make_parallel_renderer",
           "make_auto_renderer", "multihost"]
