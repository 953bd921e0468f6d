"""Device meshes and batch sharding for data-parallel training.

The reference scales with one strategy — multi-process DDP over NCCL
(`train_ddp.py:79-94`). The TPU-native equivalent is a 1-D `data` mesh over
ICI: the train step is a single SPMD program; annotating the batch with
PartitionSpec("data") makes XLA insert the psum gradient all-reduce. Per-host
input sharding replaces DistributedSampler (`train_ddp.py:85`).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and feed
each host its own shard of the global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Put batch arrays on the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
