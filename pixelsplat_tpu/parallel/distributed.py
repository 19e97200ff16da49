"""Multi-host (DCN) process wiring.

The reference scales past one node with Lightning DDP under SLURM
(/root/reference/src/main.py:94-104): one process per GPU, rank-dependent
seeds (main.py:106), per-rank data (data_module.py:87). The TPU-native
equivalent is JAX's multi-controller runtime: every host runs the same
program, `jax.distributed.initialize` wires the processes together, and
`jax.devices()` becomes the GLOBAL device list. The data mesh then spans
hosts; gradient `pmean`s ride ICI within a slice and DCN across slices —
XLA picks the transport, the program never names it (contrast NCCL
process groups).

Gating (all optional — single-process runs never touch this):
- ``PIXELSPLAT_DISTRIBUTED=1``: auto-detecting `initialize()` (TPU pod
  metadata / SLURM env, the environments the reference's
  ``SLURMEnvironment`` covers).
- ``PIXELSPLAT_COORDINATOR`` + ``PIXELSPLAT_NUM_PROCESSES`` +
  ``PIXELSPLAT_PROCESS_ID``: explicit wiring (also how the CPU
  multi-process test drives it; gloo backs the CPU collectives).
"""

from __future__ import annotations

import os

import jax


def maybe_initialize() -> tuple[int, int]:
    """Initialize `jax.distributed` when the environment asks for it.

    Returns ``(process_index, process_count)``. Call before touching any
    device (the runtime must be wired before the backend initializes).
    Idempotent: a second call (or an already-initialized runtime) is a
    no-op that just reports the current rank/world.
    """
    if jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()

    coordinator = os.environ.get("PIXELSPLAT_COORDINATOR")
    num_processes = os.environ.get("PIXELSPLAT_NUM_PROCESSES")
    process_id = os.environ.get("PIXELSPLAT_PROCESS_ID")
    auto = os.environ.get("PIXELSPLAT_DISTRIBUTED", "") == "1"

    if coordinator and num_processes and process_id:
        # `jax.default_backend()` would INITIALIZE the backend, which must
        # not happen before `initialize` — read the config instead.
        platforms = jax.config.jax_platforms or ""
        if platforms.split(",")[0] == "cpu":
            # XLA's CPU client has no cross-process transport of its own;
            # gloo provides one (the multi-process CPU test path).
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
    elif auto:
        # TPU pod / SLURM: jax discovers coordinator + rank itself, the
        # same environments Lightning's SLURMEnvironment reads.
        jax.distributed.initialize()
    else:
        return 0, 1

    return jax.process_index(), jax.process_count()


def is_rank_zero() -> bool:
    """True on the process that owns logging/checkpoint side effects.

    Mirrors Lightning's ``rank_zero_only`` gating: every process computes
    (collectives are collective), exactly one writes.
    """
    return jax.process_index() == 0
