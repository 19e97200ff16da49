"""Micro-benchmark: XLA row-gather cost model on the TPU.

The rasterizer's dominant forward stage is gathering per-tile parameter
rows packed[(T*K,)] from a (g+1, F) matrix (PERF.md: 4.8 ms at T*K=1.05M,
F=16 f32). This sweep measures how gather time scales with row width,
dtype, index count, and index order — to decide between narrower rows,
adaptive capacity, and Pallas alternatives.

Timing: k repetitions inside ONE jitted program (lax.map over perturbed
indices so each iteration re-executes), scalar output, one sync — the
axon tunnel makes per-dispatch wall timing meaningless (~4 ms/dispatch).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K_INNER = 8


def timeit_gather(table, idx, n_dispatch=3):
    perturb = jnp.arange(K_INNER, dtype=jnp.int32)

    @jax.jit
    def burst(t, i):
        def one(p):
            rows = t[jnp.bitwise_xor(i, p)]
            return rows[0, 0].astype(jnp.float32) + rows[-1, -1].astype(jnp.float32)

        return jax.lax.map(one, perturb).sum()

    np.asarray(burst(table, idx))
    t0 = time.perf_counter()
    res = [burst(table, idx) for _ in range(n_dispatch)]
    np.asarray(res[-1])
    dt = time.perf_counter() - t0

    @jax.jit
    def floor_fn(t):
        return t[0, 0].astype(jnp.float32)

    np.asarray(floor_fn(table))
    t0 = time.perf_counter()
    np.asarray(floor_fn(table))
    floor = time.perf_counter() - t0
    return max(dt - floor, 1e-9) / (K_INNER * n_dispatch)


def main():
    g = 393_216  # xor-perturbation keeps indices < 393_218 given idx < g
    rng = np.random.default_rng(0)

    for n_idx in (262_144, 1_048_576):
        base = rng.integers(0, g, n_idx)
        idx_rand = jnp.asarray(base, jnp.int32)
        idx_sort = jnp.sort(idx_rand)
        # Tile-list-like: sorted within each of 256 contiguous blocks.
        blocks = base.reshape(256, -1)
        idx_tile = jnp.asarray(np.sort(blocks, axis=1).reshape(-1), jnp.int32)
        for f, dtype in (
            (16, jnp.float32),
            (8, jnp.float32),
            (16, jnp.uint16),
            (32, jnp.uint16),
            (16, jnp.int32),
            (8, jnp.int32),
            (32, jnp.uint8),
        ):
            table = jnp.zeros((g + 2, f), dtype)
            dt_r = timeit_gather(table, idx_rand)
            dt_s = timeit_gather(table, idx_sort)
            dt_t = timeit_gather(table, idx_tile)
            rowb = f * table.dtype.itemsize
            print(
                f"n={n_idx:>9,} F={f:2d} {table.dtype.name:>8} ({rowb}B rows): "
                f"rand {dt_r*1e3:6.2f}  sorted {dt_s*1e3:6.2f}  "
                f"tilesorted {dt_t*1e3:6.2f} ms  "
                f"({n_idx*rowb/dt_r/1e9:6.1f} GB/s rand)",
                flush=True,
            )


if __name__ == "__main__":
    main()
