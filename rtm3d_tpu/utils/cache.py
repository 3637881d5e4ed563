"""Persistent XLA compilation cache setup.

First compiles of the big jitted programs take minutes; caching them on disk
makes every subsequent process start in seconds. Called by all CLIs, bench
and the driver entry. Override the location with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/rtm3d_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
    return cache_dir
