"""Pallas TPU kernel for front-to-back tile compositing.

One grid program per 16x16 tile. The depth-sorted per-tile Gaussian
parameters live in HBM as (tiles, 2F, K) uint16 — each f32 parameter
split into 16-bit halves (rows [0,F) are the high halves of the F
parameters, rows [F,2F) the low halves) — and are streamed in (2F, C)
chunks with double-buffered DMA. The u16 split exists because XLA's TPU
gather that produces this array runs ~10x faster on 16-bit rows than on
32-bit ones (tools/bench_gather.py: 21.4 ms -> 2.1 ms at 1.05M rows),
and the post-gather transpose to row-major fuses into the gather's
output layout; the kernel reassembles exact f32 with a shift per chunk.
Per chunk:

* alpha for all 256 tile pixels at once on the VPU;
* the ordered (exclusive) transmittance prefix along the chunk is a
  strictly-lower-triangular matmul in log space — an MXU (C,C)@(C,P)
  contraction instead of a serial scan;
* color accumulation is a second MXU matmul.

The chunk loop is a `lax.while_loop` that stops early once every pixel's
transmittance drops below 1e-4 — the data-dependent early exit the CUDA
kernel relies on and XLA cannot express.

Parameter rows (F=16): 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c,
5 opacity (zeroed for invalid/padding entries), 6..6+ch colors (ch <= 6),
rest zero padding.

The single output is (tiles, 256, 8): channels [0..5] composited colors,
channel 6 the number of processed chunks (early-exit point, as float),
channel 7 the final transmittance. Packing these into the color block
satisfies the TPU block-tiling constraint (a separate (1, 256) output
block is not a legal tile shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE  # 256 pixels
C = 128  # depth-chunk size (lane width)
F = 16  # parameter rows
CH_PAD = 8  # output channels (<=6 colors + n_proc + trans)
NPROC_CH = 6
TRANS_CH = 7
TRANS_EPS = 1e-4
MAX_ALPHA = 0.99
MIN_ALPHA = 1.0 / 255.0


def unpack_rows(chunk_u16: jax.Array) -> jax.Array:
    """(2F, ...) u16 [hi; lo] half rows -> (F, ...) f32, bit-exact."""
    f = chunk_u16.shape[0] // 2
    hi = chunk_u16[:f].astype(jnp.uint32)
    lo = chunk_u16[f:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _kernel(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    tiles_x_ref,  # SMEM (1,) int32 — scalar prefetch
    params_hbm,  # ANY (num_tiles, 2F, K) u16
    out_ref,  # VMEM out (1, P, CH_PAD)
    scratch,  # VMEM (2, 2F, C) u16
    sems,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    count = counts_ref[t]
    tiles_x = tiles_x_ref[0]
    n_chunks = pl.cdiv(count, C)

    # Pixel coordinates of this tile as (1, P) rows, broadcasting against
    # (C, P) chunk arrays.
    tile_x0 = ((t % tiles_x) * TILE).astype(jnp.float32)
    tile_y0 = ((t // tiles_x) * TILE).astype(jnp.float32)
    within = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tile_x0 + (within % TILE).astype(jnp.float32)
    py = tile_y0 + (within // TILE).astype(jnp.float32)

    # Strictly-lower-triangular ones for the in-chunk exclusive prefix sum.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    lower = (col_j < row_i).astype(jnp.float32)  # (C, C)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            params_hbm.at[t, :, pl.ds(chunk_idx * C, C)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        i, trans, acc = state
        return jnp.logical_and(i < n_chunks, jnp.max(trans) >= TRANS_EPS)

    def body(state):
        i, trans, acc = state
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        chunk = unpack_rows(scratch[slot])  # (F, C) f32

        mx = chunk[0, :][:, None]  # (C, 1)
        my = chunk[1, :][:, None]
        ca = chunk[2, :][:, None]
        cb = chunk[3, :][:, None]
        cc = chunk[4, :][:, None]
        op = chunk[5, :][:, None]

        dx = px - mx  # (C, P)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= MIN_ALPHA), alpha, 0.0)

        # Ordered transmittance: exclusive prefix of log(1-alpha) via MXU.
        la = jnp.log1p(-alpha)  # (C, P)
        excl = jnp.dot(lower, la, preferred_element_type=jnp.float32)  # (C, P)
        t_before = trans * jnp.exp(excl)  # trans is (1, P)
        weight = alpha * t_before  # (C, P)

        colors = chunk[6 : 6 + CH_PAD, :]  # (CH_PAD, C); rows 12-13 are zero
        acc = acc + jnp.dot(
            colors, weight, preferred_element_type=jnp.float32
        )  # (CH_PAD, P)
        trans = trans * jnp.exp(jnp.sum(la, axis=0, keepdims=True))  # (1, P)
        return i + 1, trans, acc

    trans0 = jnp.ones((1, P), jnp.float32)
    acc0 = jnp.zeros((CH_PAD, P), jnp.float32)
    n_done, trans, acc = jax.lax.while_loop(cond, body, (0, trans0, acc0))

    # On early exit the body already prefetched chunk n_done; drain it so
    # no DMA is left in flight at kernel teardown.
    @pl.when(jnp.logical_and(n_done > 0, n_done < n_chunks))
    def _():
        get_dma(n_done % 2, n_done).wait()

    # Stash n_proc / trans into the spare channels (scatter is not a TPU
    # Pallas primitive, so use iota masks).
    rows = jax.lax.broadcasted_iota(jnp.int32, (CH_PAD, P), 0)
    acc = jnp.where(rows == NPROC_CH, n_done.astype(jnp.float32), acc)
    acc = jnp.where(rows == TRANS_CH, trans, acc)
    out_ref[0] = acc.T  # (P, CH_PAD)


def pallas_composite_core(
    params_u: jax.Array,  # (num_tiles, 2F, Kpad) u16, Kpad % C == 0
    counts: jax.Array,  # (num_tiles,) int32
    tiles_x: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (acc (T, P, CH_PAD), trans (T, P), n_processed (T,))."""
    num_tiles, f2, kpad = params_u.shape
    assert f2 == 2 * F and kpad % C == 0 and params_u.dtype == jnp.uint16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, P, CH_PAD), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * F, C), jnp.uint16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    packed = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, CH_PAD), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(counts, jnp.asarray([tiles_x], jnp.int32), params_u)
    trans = packed[:, :, TRANS_CH]
    n_proc = packed[:, 0, NPROC_CH].astype(jnp.int32)
    acc = packed.at[:, :, NPROC_CH].set(0.0).at[:, :, TRANS_CH].set(0.0)
    return acc, trans, n_proc
