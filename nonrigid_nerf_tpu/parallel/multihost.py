"""Multi-host (multi-process) data parallelism.

The single-host design (parallel/mesh.py) already expresses training as
SPMD over a 1-D 'data' mesh with one gradient psum; scaling to multiple
hosts is the SAME program over a mesh that spans every process's devices —
grads ride ICI within a host and DCN across hosts, inserted by XLA from the
identical `shard_map`. This module adds the three things multi-controller
JAX needs around that program:

1. process bring-up: `maybe_initialize()` wires `jax.distributed` from
   environment variables (explicit coordinator for CPU/GPU clusters and the
   2-process CPU test harness; bare auto-detection on TPU pods);
2. global arrays: replicated jit inputs must be global `jax.Array`s whose
   sharding names the full mesh — `replicate()` lifts a host-local pytree
   (TrainState, RayDataset, PRNG key) onto the mesh;
3. IO discipline: exactly one process writes checkpoints/logs/renders —
   `is_main()`, plus `barrier()` for ordering host-side filesystem events
   (e.g. the --no_reload experiment wipe) against other processes.

The dataset itself stays replicated per host: the whole model is ~1-2 MB
and the uint8 image stack ~50 MB (example_sequence), so sharding bytes
across hosts buys nothing — every host loads the same frames and the ray
BATCH is what shards (reference analog: DataParallel scatter,
/root/reference/train.py:290-297, which this design generalizes across
machines).

Environment contract (set on every process):
  NRNERF_COORDINATOR  host:port of process 0
  NRNERF_NUM_PROCESSES  total process count
  NRNERF_PROCESS_ID     this process's rank
On TPU pod slices none of these are needed — `jax.distributed.initialize()`
auto-detects — set NRNERF_MULTIHOST=1 to request that path.

Tested by tests/test_multihost.py: two local CPU processes x 4 virtual
devices each form one 8-device mesh; the loss trajectory must match the
single-process 8-device mesh bit-for-bit (the per-device RNG folds in the
GLOBAL axis index, so the math is identical however devices map to
processes).
"""

from __future__ import annotations

import os

import numpy as np

_initialized = False


def maybe_initialize() -> int:
    """Initialize jax.distributed from the environment if requested.

    Returns the process count (1 when not distributed). Idempotent. Must be
    called before the first jax backend use in the process.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count()

    if os.environ.get("NRNERF_PLATFORM"):
        # test/debug hatch: force a backend (e.g. "cpu" for the 2-process
        # simulation on a 1-TPU box, where an installed TPU plugin may
        # override the JAX_PLATFORMS environment variable)
        jax.config.update("jax_platforms", os.environ["NRNERF_PLATFORM"])

    coord = os.environ.get("NRNERF_COORDINATOR")
    if coord:
        missing = [v for v in ("NRNERF_NUM_PROCESSES", "NRNERF_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise RuntimeError(
                "NRNERF_COORDINATOR is set but %s %s missing; explicit "
                "multihost bring-up needs all three of NRNERF_COORDINATOR "
                "(host:port of process 0), NRNERF_NUM_PROCESSES (total "
                "process count) and NRNERF_PROCESS_ID (this process's rank)"
                % (" and ".join(missing),
                   "is" if len(missing) == 1 else "are"))
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NRNERF_NUM_PROCESSES"]),
            process_id=int(os.environ["NRNERF_PROCESS_ID"]))
        _initialized = True
    elif os.environ.get("NRNERF_MULTIHOST"):
        jax.distributed.initialize()   # TPU-pod auto-detection
        _initialized = True
    return jax.process_count()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main() -> bool:
    import jax
    return jax.process_index() == 0


def barrier(name: str = "nrnerf_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def replicate(tree, mesh):
    """Lift a host-local pytree to fully-replicated global jax.Arrays on
    `mesh`. Every process must pass identical values (true for state/dataset
    built from the same seed/files). Single-process meshes pass through
    jax.device_put, which handles donation-friendly layouts."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def _put(leaf):
        if jax.process_count() == 1:
            return jax.device_put(leaf, sharding)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf))

    return jax.tree_util.tree_map(_put, tree)
