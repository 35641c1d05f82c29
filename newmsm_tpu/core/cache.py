"""Persistent XLA compilation cache.

Remote-TPU compiles cost tens of seconds per program; a full multires
registration builds dozens of programs, so cold-process compiles dominate
wall-clock unless cached on disk. The JAX_COMPILATION_CACHE_DIR env var is
ignored here because the environment imports jax before user code runs —
use jax.config.update at runtime instead (this module), which works on all
backends including the axon tunnel.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the on-disk XLA compilation cache. Returns the
    cache directory. Call early (before the first jit compilation)."""
    global _enabled
    import jax

    path = (path
            or os.environ.get("NEWMSM_COMPILE_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "newmsm_tpu", "xla"))
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path
