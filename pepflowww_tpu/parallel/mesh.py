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
    """Put batch arrays on the mesh, sharded along the leading axis.

    Single-process: the full global batch is addressable; a plain device_put
    distributes it. Multi-process (`--multihost`): each process holds only its
    OWN shard of the global batch (the DataLoader's contiguous block — see
    DataLoader.__iter__), so the global array is assembled from the
    process-local rows; jax's row-block ownership under P("data") matches the
    loader's contiguous slicing, making global row order identical to the
    single-process plan order.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1:
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree onto every device of the mesh.

    Multi-process: device_put cannot target non-addressable devices, so the
    global replicated array is assembled from the (identical) process-local
    copy — every process MUST hold the same values (train.py guarantees this
    by seeding init identically on all processes).
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda v: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)
