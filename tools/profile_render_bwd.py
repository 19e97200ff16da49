"""Device-timeline profile of render forward+backward (training workload).

Same scene as tools/profile_render.py (393k Gaussians, 256x256), but the
burst computes jax.grad of a scalar image loss w.r.t. every Gaussian
parameter — the per-view cost a training step pays. Prints per-op device
time aggregated over the TPU track.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pixelsplat_tpu.ops.rasterizer import RenderSettings, render

    g = 2 * 256 * 256 * 3
    rng = np.random.default_rng(0)
    means = np.stack(
        [rng.uniform(-2, 2, g), rng.uniform(-2, 2, g), rng.uniform(1.2, 12, g)],
        axis=-1,
    ).astype(np.float32)
    axes = rng.normal(size=(g, 3, 3)).astype(np.float32) * 0.01
    covs = axes @ axes.transpose(0, 2, 1) + 1e-6 * np.eye(3, dtype=np.float32)
    sh = (rng.normal(size=(g, 3, 25)) * 0.1).astype(np.float32)
    opac = rng.uniform(0.05, 0.6, g).astype(np.float32)
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    settings = RenderSettings(capacity=4096, big_capacity=128, chunk=128)
    params = (
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(sh)[None],
        jnp.asarray(opac)[None],
    )
    cam_shifts = jnp.linspace(-0.2, 0.2, 5)

    def loss_one(m, c, s, o, shift):
        e = jnp.eye(4)[None].at[:, 0, 3].add(shift)
        img = render(
            e,
            intr[None],
            jnp.ones(1),
            jnp.full((1,), 100.0),
            (256, 256),
            jnp.zeros((1, 3)),
            m,
            c,
            s,
            o,
            settings=settings,
        )
        return (img * img).mean()

    @jax.jit
    def burst(m, c, s, o):
        def one(shift):
            return jax.grad(loss_one, argnums=(0, 1, 2, 3))(m, c, s, o, shift)

        grads = jax.lax.map(one, cam_shifts)
        return sum(jnp.abs(t).sum() for t in jax.tree.leaves(grads))

    np.asarray(burst(*params))  # compile
    trace_dir = "/tmp/render_bwd_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        np.asarray(burst(*params))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace produced"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "XLA" not in name.upper():
                tpu_pids.add(e["pid"])
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = e.get("dur", 0) / 1e3
            by_op[e.get("name", "?")] += dur
            total += dur
    print(f"total device time: {total:.2f} ms (5 frames -> {total/5:.2f} ms/frame fwd+bwd)")
    longs = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            a = e.get("args", {})
            ln = a.get("long_name") or a.get("tf_op") or ""
            if ln:
                longs.setdefault(e.get("name", "?"), ln)
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/5:7.3f} ms/frame  {name[:60]}  | {longs.get(name, '')[:140]}")


if __name__ == "__main__":
    main()
