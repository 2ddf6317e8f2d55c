"""Profiling / timing harness.

The reference's only instrumentation is wall-clock `tic/toc` prints
(SURVEY.md §5). Here: a blocking step timer that understands jax async
dispatch, a throughput helper for the frames/sec north star, and a wrapper
around `jax.profiler` traces for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class StepTimer:
    """Collects step wall times; `summary()` gives mean/p50/p95 excluding
    warmup steps (compiles)."""

    warmup: int = 1
    times: list = field(default_factory=list)

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        import jax

        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np

        steady = self.times[self.warmup:] or self.times
        arr = np.asarray(steady)
        return {
            "steps": len(self.times),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def measure_throughput(fn, args, items_per_call: int, iters: int = 10,
                       label: str = "throughput") -> dict:
    """Time `fn(*args)` with full synchronization; returns items/sec.
    `fn` must return device arrays (blocked on per iteration)."""
    import jax

    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    result = {"label": label, "sec_per_call": dt,
              "items_per_sec": items_per_call / dt}
    print(json.dumps(result))
    return result


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/echoflow_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
