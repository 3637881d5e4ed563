"""Persistent XLA compilation cache setup.

First compiles of the big jitted programs take minutes; caching them on disk
makes every subsequent process start in seconds. Called by all CLIs, bench
and the driver entry. Override the location with JAX_COMPILATION_CACHE_DIR.

The cache directory is suffixed with a host-CPU fingerprint: XLA:CPU caches
AOT-compiled machine code keyed WITHOUT the target machine features, so
entries written on one host deserialize on another host through a slow
error-logging fallback path (measured: a warm small-model test went
132 s -> 17 s once the foreign entries were removed). A per-host directory
costs one cold compile per new machine and never hits that path.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set (what XLA:CPU AOT
    results are sensitive to)."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None):
    import jax

    # first caller wins: the test conftest configures a CPU-suite dir before
    # any CLI/facade code runs; a facade constructed mid-suite must not flip
    # the directory for the rest of the process
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        current = None
    if current:
        return current

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/rtm3d_tpu_xla")
    )
    cache_dir = f"{cache_dir}-{_host_fingerprint()}"
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
    return cache_dir
