"""Device mesh + batch sharding helpers.

The reference scales with Lightning DDP over NCCL (src/main.py:94-98). The
TPU-native equivalent: a 1-D `jax.sharding.Mesh` over the "data" axis,
batches sharded along their leading axis, parameters replicated; XLA
inserts the gradient all-reduce (psum over ICI) from sharding propagation
under `jit` — no explicit process groups.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put a nested dict batch with its leading axis sharded."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(
        put, batch, is_leaf=lambda x: not isinstance(x, dict)
    )
