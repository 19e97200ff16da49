"""Per-stage device timing of the render pipeline (bench.py workload).

Times nested prefixes of the pipeline with the bench.py burst pattern
(k renders per dispatch under lax.map, one sync); differences between
consecutive prefixes approximate per-stage device cost. XLA may fuse
differently per prefix, so treat as a guide, not a trace.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.ops.rasterizer import RenderSettings
from pixelsplat_tpu.ops.rasterizer.binning import bin_gaussians
from pixelsplat_tpu.ops.rasterizer.composite import (
    _gather_params_u16,
    pack_columns,
)
from pixelsplat_tpu.ops.rasterizer.pallas_composite import (
    pallas_composite_core,
)
from pixelsplat_tpu.ops.rasterizer.projection import project_gaussians

K_INNER = 5
N_DISPATCH = 4


def make_scene():
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
    return (
        jnp.eye(4),
        intr,
        jnp.asarray(means),
        jnp.asarray(covs),
        jnp.asarray(sh),
        jnp.asarray(opac),
    )


def timeit(fn, args):
    shifts = jnp.linspace(-0.2, 0.2, K_INNER)

    @jax.jit
    def burst(e, k, m, c, s, o):
        def one(shift):
            return fn(e.at[0, 3].add(shift), k, m, c, s, o)

        return jax.lax.map(one, shifts).sum()

    np.asarray(burst(*args))
    t0 = time.perf_counter()
    res = [burst(*args) for _ in range(N_DISPATCH)]
    np.asarray(res[-1])
    return (time.perf_counter() - t0) / (K_INNER * N_DISPATCH)


def main():
    settings = RenderSettings(capacity=4096, big_capacity=128, chunk=128)
    args = make_scene()
    image_shape = (256, 256)

    def proj(e, k, m, c, s, o):
        p = project_gaussians(e, k, image_shape, m, c, o, harmonics=s)
        return p.mean_x[0] + p.conic_a[0] + p.color[0, 0] + p.radius[0]

    def binned(e, k, m, c, s, o):
        p = project_gaussians(e, k, image_shape, m, c, o, harmonics=s)
        t = bin_gaussians(
            p, image_shape, capacity=settings.capacity,
            span=settings.span, big_capacity=settings.big_capacity,
        )
        return t.indices[0, 0] + t.overflow

    def gathered(e, k, m, c, s, o):
        p = project_gaussians(e, k, image_shape, m, c, o, harmonics=s)
        t = bin_gaussians(
            p, image_shape, capacity=settings.capacity,
            span=settings.span, big_capacity=settings.big_capacity,
        )
        g = p.depth.shape[0]
        packed = pack_columns(p)
        params_u = _gather_params_u16(packed, t.indices.reshape(-1), 256)
        return params_u[0, 0, 0].astype(jnp.float32)

    def full(e, k, m, c, s, o):
        p = project_gaussians(e, k, image_shape, m, c, o, harmonics=s)
        t = bin_gaussians(
            p, image_shape, capacity=settings.capacity,
            span=settings.span, big_capacity=settings.big_capacity,
        )
        g = p.depth.shape[0]
        packed = pack_columns(p)
        params_u = _gather_params_u16(packed, t.indices.reshape(-1), 256)
        counts = (t.indices < g).sum(axis=1).astype(jnp.int32)
        acc, trans, n_proc = pallas_composite_core(params_u, counts, 16)
        return acc[0, 0, 0] + trans[0, 0]

    stages = [("projection", proj), ("binning", binned),
              ("tile_params", gathered), ("composite", full)]
    prev = 0.0
    for name, fn in stages:
        dt = timeit(fn, args)
        print(f"{name:>12}: cum {dt*1e3:6.2f} ms  stage {(dt-prev)*1e3:6.2f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
