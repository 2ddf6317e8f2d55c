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
