"""Subprocess body for the multi-host (DCN) data-parallel test.

Each invocation is one JAX process with 4 virtual CPU devices; two of
them wire together via `parallel.distributed.maybe_initialize` (gloo CPU
collectives) into one 8-device global mesh — the CPU stand-in for two
TPU hosts joined over DCN. Rank r feeds its own half of a deterministic
global batch through `shard_batch` (the `make_array_from_process_local_data`
path) and runs ONE data-parallel train step; rank 0 dumps the updated
parameters for the parent test to compare against the single-process
8-device result.

Usage: python dcn_driver.py <rank> <world> <port> <out.npz>
"""

import os
import sys

rank, world, port, out_path = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["PIXELSPLAT_COORDINATOR"] = f"localhost:{port}"
os.environ["PIXELSPLAT_NUM_PROCESSES"] = str(world)
os.environ["PIXELSPLAT_PROCESS_ID"] = str(rank)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pixelsplat_tpu.parallel.distributed import maybe_initialize  # noqa: E402

got = maybe_initialize()
assert got == (rank, world), got
assert len(jax.devices()) == 4 * world, jax.devices()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_grad_accumulation import _make_batch  # noqa: E402
from test_multidevice_train_step import N_DEV, _make_wrapper  # noqa: E402

from pixelsplat_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402

wrapper = _make_wrapper()
# The GLOBAL batch is deterministic; each process materializes it and
# keeps only its own per-rank slice (what a per-rank loader would have
# produced).
batch = jax.tree.map(
    np.asarray,
    _make_batch(jax.random.PRNGKey(3), b=N_DEV),
    is_leaf=lambda x: not isinstance(x, dict),
)
per_rank = N_DEV // world
local = jax.tree.map(
    lambda x: x[rank * per_rank : (rank + 1) * per_rank],
    batch,
    is_leaf=lambda x: not isinstance(x, dict),
)

# Identical parameters on every process: init from the same b=1 slice.
example = jax.tree.map(
    lambda x: x[:1], batch, is_leaf=lambda x: not isinstance(x, dict)
)
state = wrapper.init_state(example, seed=0)
# Feed the jit host (numpy) leaves: a process-local committed jax.Array
# is not addressable under the global mesh; identical host values on
# every process are, and become the replicated input.
state = jax.tree.map(np.asarray, state)

mesh = make_mesh()  # global: 4 devices/process x world
step_fn, _ = wrapper.make_jit_train_step(mesh, batch_size=N_DEV)
sharded = shard_batch(local, mesh)
state, parts = step_fn(state, sharded, jax.random.PRNGKey(11))

loss = float(parts["loss/total"])
print(f"rank {rank}: loss/total {loss}", flush=True)
if rank == 0:
    flat = {
        jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
    }
    np.savez(out_path, loss=np.float64(loss), **flat)
    print(f"rank 0: wrote {out_path}", flush=True)
