"""Multi-host (DCN) data parallelism: two JAX processes of 4 CPU devices
each, wired by `parallel.distributed.maybe_initialize` (gloo collectives),
must produce the SAME train step as one process over all 8 devices.

This is the CPU stand-in for the reference's multi-node SLURM DDP launch
(/root/reference/src/main.py:94-106): per-rank data, one global
all-reduce, identical replicas afterwards. The single-process reference
runs in-process on the test's own 8-device mesh; the 2-process run
executes `dcn_driver.py` in subprocesses.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np

from pixelsplat_tpu.parallel.mesh import make_mesh, shard_batch

from test_grad_accumulation import _make_batch
from test_multidevice_train_step import N_DEV, _make_wrapper

_TESTS_DIR = Path(__file__).resolve().parent
_REPO_DIR = _TESTS_DIR.parent


def _single_process_reference():
    wrapper = _make_wrapper()
    batch = jax.tree.map(
        np.asarray,
        _make_batch(jax.random.PRNGKey(3), b=N_DEV),
        is_leaf=lambda x: not isinstance(x, dict),
    )
    example = jax.tree.map(
        lambda x: x[:1], batch, is_leaf=lambda x: not isinstance(x, dict)
    )
    state = wrapper.init_state(example, seed=0)
    mesh = make_mesh(N_DEV)
    step_fn, _ = wrapper.make_jit_train_step(mesh, batch_size=N_DEV)
    state, parts = step_fn(state, shard_batch(batch, mesh), jax.random.PRNGKey(11))
    flat = {
        jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
    }
    return float(parts["loss/total"]), flat


def test_two_process_step_equals_single_process(tmp_path):
    port = 23000 + os.getpid() % 2000
    out = tmp_path / "rank0.npz"

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(_REPO_DIR), str(_TESTS_DIR), env.get("PYTHONPATH", "")]
    )
    # The driver sets its own XLA_FLAGS (4 devices/process); drop the
    # parent conftest's 8-device flag so it can't leak through.
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(_TESTS_DIR / "dcn_driver.py"),
             str(rank), "2", str(port), str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"driver failed:\n{stdout[-4000:]}"
    assert out.exists(), outputs[0][-4000:]

    loss_ref, params_ref = _single_process_reference()
    data = np.load(out)
    np.testing.assert_allclose(float(data["loss"]), loss_ref, rtol=1e-5)
    keys = [k for k in data.files if k != "loss"]
    assert set(keys) == set(params_ref.keys())
    for k in keys:
        # gloo's all-reduce and XLA's single-process reduction associate
        # sums differently (~ulp-level per element); Adam amplifies near
        # zero second moments — same tolerance rationale as
        # test_multidevice_train_step.
        np.testing.assert_allclose(
            data[k], params_ref[k], rtol=2e-3, atol=5e-4, err_msg=k
        )
