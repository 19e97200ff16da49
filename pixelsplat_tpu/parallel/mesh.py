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
    """1-D data mesh over the GLOBAL device list.

    After `parallel.distributed.maybe_initialize`, `jax.devices()` spans
    every host, so the same mesh covers single-chip, one slice (ICI), and
    multi-slice (DCN) — XLA routes the psum per link type.
    """
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
    """Place a nested dict batch with its leading axis sharded.

    Single-process: `device_put` splits the host batch across local
    devices. Multi-process (after `distributed.maybe_initialize`): each
    process holds only its OWN loader's examples, so the local array is
    one process-shard of the global batch —
    `make_array_from_process_local_data` assembles the global view
    (global batch = local batch x process_count) without any host
    gather, exactly DDP's per-rank-data contract
    (/root/reference/src/dataset/data_module.py:87).
    """
    sharding = batch_sharding(mesh, axis)
    nproc = jax.process_count()
    local = mesh.size // nproc

    def put(x):
        if not (hasattr(x, "shape") and x.ndim >= 1):
            return x
        if nproc == 1:
            if x.shape[0] % mesh.size == 0:
                return jax.device_put(x, sharding)
            return x
        if x.shape[0] % local == 0:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return x

    return jax.tree.map(
        put, batch, is_leaf=lambda x: not isinstance(x, dict)
    )
