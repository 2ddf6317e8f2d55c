"""Test configuration: run everything on CPU with 8 virtual XLA devices.

This is the TPU analog of a fake backend (SURVEY.md §4): multi-chip sharding
code paths are exercised on a `Mesh` over 8 host devices, and numerics are
validated in float32 on CPU where torch (CPU) is available as a golden
oracle for grid_sample / interpolate semantics.
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The pytest process already IS a correctly-configured 8-virtual-CPU-device
# environment, so __graft_entry__.dryrun_multichip can run in-process
# (child mode) instead of re-exec'ing a fresh interpreter per test.
os.environ["_ECHOFLOW_DRYRUN_CHILD"] = "1"

import jax  # noqa: E402

# The env var alone is NOT enough here: this environment's sitecustomize
# imports jax at interpreter start (to register the TPU PJRT plugin), so
# jax's config snapshot of JAX_PLATFORMS predates the line above and the
# suite would silently run on the real TPU chip. The config update rebinds
# platform selection before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    f"test suite must run on the virtual CPU mesh, got {jax.default_backend()}")
assert jax.device_count() >= 8, (
    f"need 8 virtual CPU devices, got {jax.device_count()}")

# Persistent XLA compilation cache: this host has ONE CPU core, so fresh
# jit compiles dominate test wall time. With the cache warm, repeat suite
# runs drop from tens of minutes to a few.
from echoflow.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
