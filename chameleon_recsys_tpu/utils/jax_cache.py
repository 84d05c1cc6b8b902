"""Persistent XLA compile cache, shared by every CLI entry point.

The full-size NAR train step takes minutes to compile (the G1
configuration is ~5 min through the remote-compile dev backend); without a
persistent cache every trainer process re-pays it, which dominated short
runs' wall clock.  bench.py already enabled this for benchmarking — this
makes it uniform for the production CLIs.  Override the location with
``CHAMELEON_JAX_CACHE`` (set it to an empty string to disable).
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/chameleon_jax_cache"


def enable_persistent_compile_cache() -> None:
    cache_dir = os.environ.get("CHAMELEON_JAX_CACHE", DEFAULT_CACHE_DIR)
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # older jax without the knobs — run uncached
        pass
