"""Persistent XLA compilation cache.

Compiles for this TPU go through a remote compile service with minutes-level
queueing; caching compiled executables on local disk makes re-runs (bench,
training restarts) near-instant. Call `enable_compilation_cache()` before
building any jitted computation (entry points do this automatically).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/bsms-jax-cache")


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, even fast compiles.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        print(f"[cache] compilation cache unavailable: {e}", flush=True)
