"""Pallas TPU backward kernel for tile compositing.

Mirrors the CUDA rasterizer's backward strategy: walk each tile's Gaussian
list back-to-front, reconstructing per-Gaussian transmittance from the
forward's final transmittance (log space, so dividing out (1-alpha)
factors stays stable) and accumulating the suffix sum S_i =
sum_{j>i} w_j (c_j . g) needed for d alpha. Per-chunk suffix scans are
triangular matmuls on the MXU; parameter gradients are pixel-axis
reductions written back chunk-by-chunk with DMA.

Gradient formulas (per pixel, g = dL/dacc, gT = dL/dtrans):
  w_i   = alpha_i T_i
  dc_i  = w_i g
  dalpha_i = T_i (c_i . g) - (S_i + gT * T_end) / (1 - alpha_i)
then through alpha_i = min(0.99, op_i exp(power_i)) (zero where the
forward masked or clamped) to (d op, d conic, d mean2d).

Input parameters arrive in the forward's (T, 2F, K) u16 split-half layout
(see pallas_composite.py); gradients leave as (T, F, K) f32.

Cotangent packing:
`packed_g` is (T, CH_PAD, P) with color cotangents in channels [0..5],
the forward's final transmittance in channel NPROC_CH and the
transmittance cotangent in channel TRANS_CH. The forward's per-tile
early-exit chunk count arrives via scalar prefetch, so the backward walks
exactly the chunks the forward processed and zeroes the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_composite import (
    C,
    CH_PAD,
    F,
    MAX_ALPHA,
    MIN_ALPHA,
    NPROC_CH,
    P,
    TILE,
    TRANS_CH,
    unpack_rows,
)


def _bwd_kernel(
    n_proc_ref,  # SMEM (T,) chunks the forward processed
    bstart_ref,  # SMEM (T,) per-tile chunk base in the flat block array
    counts_ref,  # SMEM (T,) list lengths (total chunks = ceil(counts/c))
    tiles_x_ref,  # SMEM (1,)
    params_hbm,  # ANY (n_blocks_total, 2F, c) u16 — flat chunk blocks
    packed_g_ref,  # VMEM (1, CH_PAD, P)
    d_params_hbm,  # ANY out (n_blocks_total, F, c) f32 — flat chunk blocks
    in_scratch,  # VMEM (2, 2F, c) u16
    out_scratch,  # VMEM (2, F, c) f32
    in_sems,  # DMA (2,)
    out_sems,  # DMA (2,)
    *,
    c: int,  # depth-chunk size (see pallas_composite._kernel)
):
    t = pl.program_id(0)
    n_proc = n_proc_ref[t]
    base = bstart_ref[t]
    tiles_x = tiles_x_ref[0]
    total_chunks = pl.cdiv(counts_ref[t], c)

    tile_x0 = ((t % tiles_x) * TILE).astype(jnp.float32)
    tile_y0 = ((t // tiles_x) * TILE).astype(jnp.float32)
    within = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tile_x0 + (within % TILE).astype(jnp.float32)
    py = tile_y0 + (within // TILE).astype(jnp.float32)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    upper_incl = (col_j >= row_i).astype(jnp.float32)
    upper_strict = (col_j > row_i).astype(jnp.float32)

    packed = packed_g_ref[0]  # (CH_PAD, P)
    trans_final = packed[NPROC_CH, :][None, :]  # (1, P)
    g_trans = packed[TRANS_CH, :][None, :]  # (1, P)
    # Color cotangents with the stashed channels zeroed (params color rows
    # 12-13 are zero anyway, but d_colors reductions read g directly).
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (CH_PAD, P), 0)
    g = jnp.where(ch_ids < NPROC_CH, packed, 0.0)  # (CH_PAD, P)

    def get_in_dma(slot, chunk_idx):
        # Contiguous (2F, C) chunk blocks; see pallas_composite.get_dma.
        return pltpu.make_async_copy(
            params_hbm.at[base + chunk_idx],
            in_scratch.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            d_params_hbm.at[base + chunk_idx],
            out_sems.at[slot],
        )

    @pl.when(n_proc > 0)
    def _():
        get_in_dma(0, n_proc - 1).start()

    log_t_end0 = jnp.log(jnp.maximum(trans_final, 1e-30))  # (1, P)
    s_run0 = g_trans * trans_final  # (1, P)
    zero_chunk = jnp.zeros((F, c), jnp.float32)

    def body(k, state):
        # k counts processed-from-the-back; chunk index i walks backward.
        log_t_end, s_run = state
        i = n_proc - 1 - k
        slot = k % 2

        @pl.when(k + 1 < n_proc)
        def _():
            get_in_dma((k + 1) % 2, i - 1).start()

        get_in_dma(slot, i).wait()
        chunk = unpack_rows(in_scratch[slot])  # (F, C) f32

        mx = chunk[0, :][:, None]
        my = chunk[1, :][:, None]
        ca = chunk[2, :][:, None]
        cb = chunk[3, :][:, None]
        cc = chunk[4, :][:, None]
        op = chunk[5, :][:, None]
        colors = jnp.concatenate(
            [chunk[6:F], jnp.zeros((CH_PAD - (F - 6), c), jnp.float32)]
        )  # (CH_PAD, C)

        dx = px - mx  # (C, P)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        expp = jnp.exp(power)
        raw = op * expp
        live = (power <= 0.0) & (raw >= MIN_ALPHA)
        alpha = jnp.where(live, jnp.minimum(MAX_ALPHA, raw), 0.0)
        pass_through = (live & (raw < MAX_ALPHA)).astype(jnp.float32)

        la = jnp.log1p(-alpha)  # (C, P)
        suffix_incl = jnp.dot(upper_incl, la, preferred_element_type=jnp.float32)
        t_i = jnp.exp(log_t_end - suffix_incl)  # (C, P)
        w = alpha * t_i

        # Per-(gaussian, pixel) color-dot-grad.
        cg = jnp.dot(colors.T, g, preferred_element_type=jnp.float32)  # (C, P)
        u = w * cg
        suffix_u = jnp.dot(upper_strict, u, preferred_element_type=jnp.float32)
        s_i = s_run + suffix_u

        d_alpha = (t_i * cg - s_i / (1.0 - alpha)) * pass_through
        d_power = d_alpha * raw
        d_op = jnp.sum(d_alpha * expp, axis=1)  # (C,)

        d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=1)
        d_cb = jnp.sum(-dx * dy * d_power, axis=1)
        d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=1)
        d_mx = jnp.sum((ca * dx + cb * dy) * d_power, axis=1)
        d_my = jnp.sum((cc * dy + cb * dx) * d_power, axis=1)
        d_colors = jnp.dot(g, w.T, preferred_element_type=jnp.float32)  # (CH_PAD, C)

        d_chunk = jnp.concatenate(
            [
                d_mx[None, :],
                d_my[None, :],
                d_ca[None, :],
                d_cb[None, :],
                d_cc[None, :],
                d_op[None, :],
                d_colors[: F - 6],
            ],
            axis=0,
        )  # (F, C)

        # Double-buffered output: wait only for the write that used this
        # slot two iterations ago (a start+wait per chunk serialized the
        # whole sweep on the store DMA).
        @pl.when(k >= 2)
        def _():
            out_dma(slot, i).wait()

        out_scratch[slot] = d_chunk
        out_dma(slot, i).start()

        log_t_end = log_t_end - jnp.sum(la, axis=0, keepdims=True)
        s_run = s_run + jnp.sum(u, axis=0, keepdims=True)
        return log_t_end, s_run

    jax.lax.fori_loop(0, n_proc, body, (log_t_end0, s_run0))

    # Drain the (up to two) outstanding writes before reusing the slots.
    @pl.when(n_proc >= 1)
    def _():
        out_dma((n_proc - 1) % 2, 0).wait()

    @pl.when(n_proc >= 2)
    def _():
        out_dma((n_proc - 2) % 2, 0).wait()

    # Chunks the forward never processed get zero gradients; the zero block
    # never changes, so only the DMAs are paced (two in flight).
    out_scratch[0] = zero_chunk
    out_scratch[1] = zero_chunk
    n_zero = total_chunks - n_proc

    def zero_body(k2, _):
        slot = k2 % 2

        @pl.when(k2 >= 2)
        def _():
            out_dma(slot, 0).wait()

        out_dma(slot, n_proc + k2).start()
        return 0

    jax.lax.fori_loop(0, n_zero, zero_body, 0)

    @pl.when(n_zero >= 1)
    def _():
        out_dma((n_zero - 1) % 2, 0).wait()

    @pl.when(n_zero >= 2)
    def _():
        out_dma((n_zero - 2) % 2, 0).wait()


def pallas_composite_bwd(
    params_u: jax.Array,  # (n_blocks_total, 2F, C) u16 flat chunk blocks
    n_proc: jax.Array,  # (T,) chunks processed by the forward
    block_start: jax.Array,  # (T,) chunk base per tile
    packed_g: jax.Array,  # (T, CH_PAD, P): see module docstring
    tiles_x: int,
    max_blocks: int,  # unused; API parity with the forward core
    counts: jax.Array | None = None,  # (T,) list lengths; None -> n_proc
    interpret: bool = False,
) -> jax.Array:
    """Returns d_params as (n_blocks_total, F, c) f32 flat chunk blocks."""
    nb_total, f2, c = params_u.shape
    assert f2 == 2 * F and c == 128 and params_u.dtype == jnp.uint16
    num_tiles = n_proc.shape[0]
    if counts is None:
        counts = n_proc * c  # every tile chunk was processed

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, CH_PAD, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * F, c), jnp.uint16),
            pltpu.VMEM((2, F, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((nb_total, F, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        n_proc,
        block_start,
        counts,
        jnp.asarray([tiles_x], jnp.int32),
        params_u,
        packed_g,
    )
