"""Persistent XLA compilation cache.

First compiles of the fusion graph take minutes; enabling jax's persistent
cache makes every subsequent process start warm. Call this at entry-point
startup (bench.py, motion_segment.py, training drivers).
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """CPU-feature fingerprint of the running host.

    XLA:CPU AOT artifacts are machine code for the build host's exact
    feature set, and this environment's VMs snapshot/restore across
    physical hosts with different AVX/AMX sets — loading a mismatched
    artifact warns "could lead to execution errors such as SIGILL" and has
    aborted a jitted step live. Keying the cache directory by the cpuinfo
    flags line makes a migration start a fresh (empty) cache instead of
    executing foreign machine code.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


def enable_persistent_cache(path: str | None = None):
    import jax

    base = path or os.environ.get(
        "ECHOFLOW_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     ".jax_cache"))
    cache_dir = os.path.join(base, f"host-{_host_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
