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

Parameter rows (F=12): 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c,
5 opacity (zeroed for invalid/padding entries), 6..6+ch colors (ch <= 6,
zero-padded).

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
F = 12  # parameter rows (6 geometry + up to 6 colors); slimmer rows
# cut the u16 row gather and kernel DMA traffic by 25% vs F=16
CH_PAD = 8  # output channels (<=6 colors + n_proc + trans)
NPROC_CH = 6
TRANS_CH = 7
TRANS_EPS = 1e-4
MAX_ALPHA = 0.99
MIN_ALPHA = 1.0 / 255.0


def split_matmul(a_bf16: jax.Array, x: jax.Array) -> jax.Array:
    """a @ x with a exactly representable in bf16 (e.g. a 0/1 triangle).

    Two native-rate bf16 MXU passes over the hi/lo split of x: exact to
    ~2^-18 relative (the lo remainder is < 2^-9 |x| and its own bf16
    rounding adds < 2^-9 of that), below the f32 matmul's own
    accumulation error at C=128. Mosaic's f32 matmul costs several MXU
    passes; this costs two.
    """
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(
        a_bf16, x_hi, preferred_element_type=jnp.float32
    ) + jnp.dot(a_bf16, x_lo, preferred_element_type=jnp.float32)


def unpack_rows(chunk_u16: jax.Array) -> jax.Array:
    """(2F, ...) u16 [hi; lo] half rows -> (F, ...) f32, bit-exact."""
    f = chunk_u16.shape[0] // 2
    hi = chunk_u16[:f].astype(jnp.uint32)
    lo = chunk_u16[f:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _kernel(
    counts_ref,  # SMEM (num_tiles,) int32 — scalar prefetch
    bstart_ref,  # SMEM (num_tiles,) int32 — per-tile chunk base
    tiles_x_ref,  # SMEM (1,) int32 — scalar prefetch
    params_hbm,  # ANY (n_blocks_total, 2F, C) u16 — flat chunk blocks
    out_ref,  # VMEM out (TPB, P, CH_PAD)
    scratch,  # VMEM (2, max_blocks, 2F, C) u16 — double-buffered tile lists
    sems,  # DMA semaphores (2, n_quarters)
    *,
    quarter: int,  # chunks per prefetch DMA (divides max_blocks)
    tiles_per_program: int,
    c: int,  # depth-chunk size (<= 128; smaller chunks shrink the
    # quadratic prefix-matmul work per pair at finer early-exit grain)
):
    # Each grid program handles `tiles_per_program` tiles: one grid step
    # costs ~6.6 us of fixed overhead (measured with count=0), which at
    # one tile per step dwarfed the actual compositing work.
    t0 = pl.program_id(0) * tiles_per_program
    tiles_x = tiles_x_ref[0]

    # Strictly-lower-triangular ones for the in-chunk exclusive prefix sum.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lower = (col_j < row_i).astype(jnp.bfloat16)  # (c, c), exact in bf16

    # Quadratic pixel basis in tile-local coordinates: the per-pixel
    # Gaussian exponent becomes one (C, 8) @ (8, P) MXU matmul instead of
    # ~10 VPU passes over (C, P) (the VPU was the per-chunk bottleneck).
    # Tile-local x, y < 16, so x^2, xy <= 225 are exact in bfloat16.
    within = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xl = (within % TILE).astype(jnp.float32)  # (1, P)
    yl = (within // TILE).astype(jnp.float32)
    basis1 = jnp.concatenate(
        [
            xl * xl,
            yl * yl,
            xl * yl,
            xl,
            yl,
            jnp.zeros_like(xl),
            jnp.zeros_like(xl),
            jnp.zeros_like(xl),
        ],
        axis=0,
    ).astype(jnp.bfloat16)  # (8, P), exact
    # The 3-way-split coefficient matmul runs as ONE (C, 24) @ (24, P)
    # MXU pass over a stacked basis: with K=8 the MXU pass is
    # latency-bound, so three separate passes cost 3x this one
    # (measured: 1.55 ms -> ~0.5 ms of the frame's kernel time).
    basis = jnp.concatenate([basis1, basis1, basis1], axis=0)  # (24, P)

    def n_quarters_of(t):
        return pl.cdiv(pl.cdiv(counts_ref[t], c), quarter)

    def get_dma(slot, t, q):
        # One DMA per `quarter` chunks (a contiguous 8 KB * quarter
        # burst): per-chunk double buffering left the loop
        # DMA-latency-bound (~0.9 us/chunk wait vs ~0.5 us/chunk compute).
        # The burst may run past this tile's blocks into the next tile's
        # (or the sentinel margin) — those scratch slots are never read.
        return pltpu.make_async_copy(
            params_hbm.at[pl.ds(bstart_ref[t] + q * quarter, quarter)],
            scratch.at[slot, pl.ds(q * quarter, quarter)],
            sems.at[slot, q],
        )

    @pl.when(n_quarters_of(t0) > 0)
    def _():
        get_dma(0, t0, 0).start()

    def tile_body(lt, _):
        t = t0 + lt
        slot = lt % 2
        count = counts_ref[t]
        n_chunks = pl.cdiv(count, c)
        n_quarters = pl.cdiv(n_chunks, quarter)

        # The other slot is fully drained (tile lt-1 finished with it), so
        # the next tile's first quarter streams in behind this whole tile.
        @pl.when(lt + 1 < tiles_per_program)
        def _():
            @pl.when(n_quarters_of(t + 1) > 0)
            def _():
                get_dma(1 - slot, t + 1, 0).start()

        tile_x0 = ((t % tiles_x) * TILE).astype(jnp.float32)
        tile_y0 = ((t // tiles_x) * TILE).astype(jnp.float32)

        def cond(state):
            i, tmax_prev, trans, acc = state
            return jnp.logical_and(i < n_chunks, tmax_prev >= TRANS_EPS)

        def body(state):
            i, tmax_prev, trans, acc = state

            # Entering quarter q: kick off q+1 (one-quarter lookahead),
            # then wait for q's arrival.
            @pl.when(i % quarter == 0)
            def _():
                q = i // quarter

                @pl.when(q + 1 < n_quarters)
                def _():
                    get_dma(slot, t, q + 1).start()

                get_dma(slot, t, q).wait()

            chunk = unpack_rows(scratch[slot, i])  # (F, C) f32

            mxl = chunk[0, :][:, None] - tile_x0  # (C, 1), tile-local
            myl = chunk[1, :][:, None] - tile_y0
            ca = chunk[2, :][:, None]
            cb = chunk[3, :][:, None]
            cc = chunk[4, :][:, None]
            op = chunk[5, :][:, None]

            # power(x, y) = -((x-mx), (y-my)) conic quadratic, expanded
            # over the pixel basis; all heavy per-pixel work rides the MXU.
            # The expansion cancels catastrophically for far-off-tile
            # centers (monomial terms reach ~1e4-1e5 while the exponent
            # itself is O(1)), so the constant term stays on the VPU in
            # f32 and the x/y-dependent coefficients get a THREE-way bf16
            # split (~2^-26 relative; a 2-way split's 2^-17 showed up as
            # 0.076 max image error on far elongated Gaussians).
            const = (
                -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
            )  # (C, 1)
            coef = jnp.concatenate(
                [
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                    ca * mxl + cb * myl,
                    cc * myl + cb * mxl,
                    jnp.zeros_like(ca),
                    jnp.zeros_like(ca),
                    jnp.zeros_like(ca),
                ],
                axis=1,
            )  # (C, 8)
            c1 = coef.astype(jnp.bfloat16)
            r1 = coef - c1.astype(jnp.float32)
            c2 = r1.astype(jnp.bfloat16)
            c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)
            c123 = jnp.concatenate([c1, c2, c3], axis=1)  # (C, 24)
            power = (
                jnp.dot(c123, basis, preferred_element_type=jnp.float32)
                + const
            )
            alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(power))
            alpha = jnp.where((power <= 0.0) & (alpha >= MIN_ALPHA), alpha, 0.0)

            # Ordered transmittance: exclusive log(1-alpha) prefix via MXU.
            la = jnp.log1p(-alpha)  # (C, P)
            excl = split_matmul(lower, la)  # (C, P)
            t_before = trans * jnp.exp(excl)  # trans is (1, P)
            weight = alpha * t_before  # (C, P)

            colors = jnp.concatenate(
                [chunk[6:F], jnp.zeros((CH_PAD - (F - 6), c), jnp.float32)]
            )  # (CH_PAD, C); spare rows feed the n_proc/trans channels
            acc = acc + jnp.dot(
                colors, weight, preferred_element_type=jnp.float32
            )  # (CH_PAD, P)
            trans = trans * jnp.exp(jnp.sum(la, axis=0, keepdims=True))
            # The exit check lags one chunk: the vector->scalar reduction
            # feeding the loop predicate otherwise stalls every iteration.
            # One extra chunk may be composited, which only moves the
            # result closer to the exact (no-early-exit) image.
            return i + 1, jnp.max(trans), trans, acc

        trans0 = jnp.ones((1, P), jnp.float32)
        acc0 = jnp.zeros((CH_PAD, P), jnp.float32)
        n_done, _, trans, acc = jax.lax.while_loop(
            cond, body, (0, jnp.float32(1.0), trans0, acc0)
        )

        # Quarters waited so far = ceil(n_done / quarter); at most one
        # more (the lookahead, or the prologue when n_done == 0) is in
        # flight — drain it before the slot is reused.
        waited = pl.cdiv(n_done, quarter)

        @pl.when(waited < n_quarters)
        def _():
            get_dma(slot, t, waited).wait()

        # Stash n_proc / trans into the spare channels (scatter is not a
        # TPU Pallas primitive, so use iota masks). The output stays in
        # the accumulator's (CH_PAD, P) orientation: transposing to
        # (P, CH_PAD) cost ~5 us/tile of vreg shuffles into a 16x
        # lane-padded block and dominated the whole kernel.
        rows = jax.lax.broadcasted_iota(jnp.int32, (CH_PAD, P), 0)
        acc = jnp.where(rows == NPROC_CH, n_done.astype(jnp.float32), acc)
        acc = jnp.where(rows == TRANS_CH, trans, acc)
        out_ref[lt] = acc  # (CH_PAD, P)
        return 0

    jax.lax.fori_loop(0, tiles_per_program, tile_body, 0)


def pallas_composite_core(
    params_u: jax.Array,  # (n_blocks_total, 2F, C) u16 flat chunk blocks
    counts: jax.Array,  # (num_tiles,) int32
    block_start: jax.Array,  # (num_tiles,) int32 chunk base per tile
    tiles_x: int,
    max_blocks: int,  # per-tile chunk bound (binning capacity / C)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (acc (T, CH_PAD, P), trans (T, P), n_processed (T,))."""
    nb_total, f2, c = params_u.shape
    # Mosaic DMA slices must be 128-lane aligned, so the chunk (lane) dim
    # is fixed at 128 (sub-128 chunks would halve the prefix-matmul work
    # per pair but cannot stream).
    assert f2 == 2 * F and c == 128 and params_u.dtype == jnp.uint16
    num_tiles = counts.shape[0]
    quarter = next(q for q in (8, 4, 2, 1) if max_blocks % q == 0)
    tpb = next(q for q in (16, 8, 4, 2, 1) if num_tiles % q == 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tpb, CH_PAD, P), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, max_blocks, 2 * F, c), jnp.uint16),
            pltpu.SemaphoreType.DMA((2, max_blocks // quarter)),
        ],
    )
    packed = pl.pallas_call(
        functools.partial(
            _kernel, quarter=quarter, tiles_per_program=tpb, c=c
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, CH_PAD, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(counts, block_start, jnp.asarray([tiles_x], jnp.int32), params_u)
    trans = packed[:, TRANS_CH, :]
    n_proc = packed[:, NPROC_CH, 0].astype(jnp.int32)
    acc = packed.at[:, NPROC_CH, :].set(0.0).at[:, TRANS_CH, :].set(0.0)
    return acc, trans, n_proc
