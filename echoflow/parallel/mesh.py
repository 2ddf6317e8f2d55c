"""Mesh construction and sharding helpers.

The reference's only parallelism is single-process DataParallel batch
scatter (motion_segment.py:69; SURVEY.md §2.4). The TPU-native replacement
is a 1-D `data` mesh over ICI: the train/eval steps are jitted with batch
inputs sharded on `data` and parameters replicated; XLA inserts the gradient
all-reduce. The axis plumbing leaves room for a future `model` axis but does
not implement one (a 31.6M-param model needs none).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the `data` axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch-leading arrays sharded over `data`."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host initialization (jax.distributed). No-op when single-host
    or already initialized. Dataset-scale benchmarking shards *videos*
    across hosts (no cross-host tensor traffic — SURVEY.md §5); use
    `host_shard_indices` for the per-host slice."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def host_shard_indices(total: int, process_index: int | None = None,
                       process_count: int | None = None) -> range:
    """Contiguous per-host slice of a dataset of `total` items: host i gets
    items [i*chunk, min((i+1)*chunk, total))."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    chunk = -(-total // pc)
    return range(pi * chunk, min((pi + 1) * chunk, total))
