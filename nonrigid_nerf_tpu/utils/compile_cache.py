"""Persistent XLA compilation cache.

The first compile of the fused train step takes ~130s cold on the TPU box
(remote compile); the persistent cache brings a repeat launch to ~12s.
Enabled by default via the `compilation_cache_dir` flag (train CLI, FVR,
bench); set it to "" / "none" to disable. Safe to share across runs and
configs — entries key on the full HLO + compile options.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path) -> None:
    """Point jax at a persistent on-disk compilation cache. No-op for
    falsy/"none" paths. Call before the first compile (any time after
    import works)."""
    if not path or str(path).lower() == "none":
        return
    path = os.path.expanduser(str(path))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
