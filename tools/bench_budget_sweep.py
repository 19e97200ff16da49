"""Sweep the rasterizer's static pair budget / capacity on the bench scene.

The precise ellipse-vs-tile binning test (ops/rasterizer/binning.py)
prunes a large fraction of candidate (gaussian, tile) pairs, so the
static `pair_budget` that previously had to cover AABB-binned pairs can
shrink — and every budget-sized sort/gather in the forward AND the
backward's segment sort scales with it. This tool measures, per
(pair_budget, capacity) setting on the worst-case 393k-Gaussian scene:

  - pairs actually used + overflow (dropped pairs; must be 0 to be safe)
  - forward device time per frame
  - forward+backward device time per frame (jax.grad wrt all params)

Timing protocol: 5-frame lax.map burst, async dispatch, one scalar host
sync, transfer floor subtracted (see PERF.md; block_until_ready is a
no-op through the axon tunnel).

Usage: PYTHONPATH=.:$PYTHONPATH python tools/bench_budget_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


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
        jnp.eye(4)[None],
        intr[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        jnp.zeros((1, 3)),
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(sh)[None],
        jnp.asarray(opac)[None],
    )


def time_burst(fn, *args, reps: int = 3) -> float:
    """Seconds per burst: async dispatches, one host sync, floor-subtracted."""
    np.asarray(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(reps)]
    np.asarray(out[-1])
    dt = time.perf_counter() - t0

    @jax.jit
    def floor_fn(x):
        return x[0, 0]

    np.asarray(floor_fn(args[0]))
    t0 = time.perf_counter()
    np.asarray(floor_fn(args[0]))
    floor = time.perf_counter() - t0
    return max(dt - floor, 1e-9) / reps


def main():
    from pixelsplat_tpu.ops.rasterizer import RenderSettings, render

    args = make_scene()
    cam_shifts = jnp.linspace(-0.2, 0.2, 5)

    sweeps = [
        # (pair_budget, capacity)  — None = binning default (2x gaussians)
        (None, 4096),
        (786432, 4096),
        (655360, 4096),
        (524288, 4096),
        (524288, 3072),
        (458752, 3072),
        (393216, 2048),
    ]

    for pair_budget, capacity in sweeps:
        settings = RenderSettings(
            capacity=capacity,
            big_capacity=128,
            chunk=128,
            pair_budget=pair_budget,
        )

        @jax.jit
        def overflow_probe(e, k, nr, f, bg, m, c, s, o):
            _, ovf = render(
                e, k, nr, f, (256, 256), bg, m, c, s, o,
                settings=settings, return_overflow=True,
            )
            return ovf

        ovf = int(np.asarray(overflow_probe(*args)).max())

        @jax.jit
        def fwd_burst(e, k, nr, f, bg, m, c, s, o):
            def one(shift):
                img = render(
                    e.at[:, 0, 3].add(shift), k, nr, f, (256, 256),
                    bg, m, c, s, o, settings=settings,
                )
                return img[0, 0, 0, 0]

            return jax.lax.map(one, cam_shifts).sum()

        @jax.jit
        def fwdbwd_burst(e, k, nr, f, bg, m, c, s, o):
            def one_loss(shift):
                def loss(m_, c_, s_, o_):
                    img = render(
                        e.at[:, 0, 3].add(shift), k, nr, f, (256, 256),
                        bg, m_, c_, s_, o_, settings=settings,
                    )
                    return (img * img).mean()

                gr = jax.grad(loss, argnums=(0, 1, 2, 3))(m, c, s, o)
                return sum(x.sum() for x in gr)

            return jax.lax.map(one_loss, cam_shifts).sum()

        fwd = time_burst(fwd_burst, *args) / 5
        fwdbwd = time_burst(fwdbwd_burst, *args) / 5
        print(
            f"pair_budget={pair_budget} capacity={capacity}: "
            f"overflow={ovf} fwd={fwd * 1e3:.2f} ms/frame "
            f"fwd+bwd={fwdbwd * 1e3:.2f} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
