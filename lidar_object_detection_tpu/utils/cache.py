"""Persistent XLA compilation cache.

TPU compiles of the fused pipeline / Hungarian scan are tens of seconds;
enabling JAX's on-disk compilation cache makes every repeat process start
warm.  Called by the CLI and bench entry points; safe to call twice.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "LIDAR_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lidar_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
