"""Persistent XLA compilation cache.

First compiles of the fusion graph take minutes; enabling jax's persistent
cache makes every subsequent process start warm. Call this at entry-point
startup (bench.py, motion_segment.py, training drivers).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None):
    import jax

    cache_dir = path or os.environ.get(
        "ECHOFLOW_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
