"""Front-to-back alpha compositing of binned Gaussians.

Two backends share one per-tile parameter layout (tiles, 16, K) — built
with a differentiable gather from the depth-sorted Gaussian arrays:

* A Pallas TPU kernel (pallas_composite.py) with double-buffered HBM
  streaming, MXU prefix-product matmuls and per-tile early termination —
  the production path, replacing the CUDA rasterizer's per-tile loop.
* A pure-XLA `lax.scan` over depth chunks — the reference/fallback path
  (CPU tests, and the recompute backward of the Pallas forward).

The backward mirrors how the CUDA kernel re-walks tiles in its backward:
the custom VJP recomputes alphas chunk-by-chunk (no O(K) residuals).

Note: the CUDA kernel permanently stops a pixel once transmittance would
drop below 1e-4 (skipping the crossing Gaussian). The XLA path composites
exactly; the Pallas path stops per-tile once *all* pixels saturate. Both
differ from CUDA by at most 1e-4 in color, far below 1/255 quantization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .binning import TileLists, per_tile_indices
from .projection import MIN_ALPHA, ProjectedGaussians

MAX_ALPHA = 0.99
F = 12  # parameter rows in the packed layout (6 geometry + 6 colors)
CH_PAD = 8


def pack_columns(projected: ProjectedGaussians) -> jax.Array:
    """Pack per-Gaussian parameter columns into one (g+1, F) f32 matrix.

    The last row is the zero sentinel invalid list slots point to, so the
    whole per-tile assembly is a single row gather — per-column gathers
    were ~45 ms/frame at production scale. Differentiable w.r.t. the
    projected Gaussian arrays.
    """
    ch = projected.color.shape[0]
    assert ch <= 6  # channels 6-7 carry n_proc + transmittance
    op = jnp.where(projected.valid, projected.opacity, 0.0)
    cols = [
        projected.mean_x,
        projected.mean_y,
        projected.conic_a,
        projected.conic_b,
        projected.conic_c,
        op,
    ]
    cols += [projected.color[i] for i in range(ch)]
    packed = jnp.stack(cols, axis=-1)  # (g, 6+ch)
    return jnp.pad(packed, ((0, 1), (0, F - packed.shape[-1])))  # (g+1, F)


def pack_table_u16(packed: jax.Array) -> jax.Array:
    """(rows, F) f32 -> (rows, 2F) u16 as [high halves | low halves].

    XLA's TPU gather runs ~10x faster on 16-bit rows than 32-bit ones
    (tools/bench_gather.py); the kernels reassemble exact f32 in VMEM.
    """
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint16)  # (rows, F, 2)
    # XLA bitcast-convert puts the low-order bits at minor index 0.
    return jnp.concatenate([bits[..., 1], bits[..., 0]], axis=-1)


def build_tile_params(
    projected: ProjectedGaussians,
    tiles: TileLists,
    chunk: int = 128,
    capacity: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Gather per-tile, depth-ordered parameters into (T, F, Kpad) f32.

    `capacity` must be >= the capacity `tiles` was binned with. The
    XLA-backend path (CPU tests / non-default tile shapes); the Pallas
    path uses `_composite_packed` below instead.
    """
    g = projected.depth.shape[0]
    packed = pack_columns(projected)
    indices = per_tile_indices(tiles, capacity, g, chunk)

    if jax.default_backend() == "cpu":
        rows = packed[indices]  # (T, K, F) — one gather
    else:
        # Same gather, but with a sort-based VJP: XLA's scatter-add
        # backward costs ~57 ms/view at production scale on TPU.
        from .tile_gather import gather_rows

        rows = gather_rows(packed, indices)
    params = rows.transpose(0, 2, 1)  # (T, F, K)
    k_ = params.shape[-1]
    params = jnp.pad(params, ((0, 0), (0, 0), (0, (-k_) % chunk)))
    return params, tiles.counts


def _xla_composite_core(
    params_t: jax.Array,  # (T, F, Kpad)
    counts: jax.Array,  # (T,) — unused (opacity already masked); kept for
    tiles_x: int,  # API parity with the Pallas core
    tile_size: int = 16,
    chunk: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Reference scan implementation on the packed layout."""
    num_tiles, f, kpad = params_t.shape
    p = tile_size * tile_size
    n_chunks = kpad // chunk

    tile_ids = jnp.arange(num_tiles)
    within = jnp.arange(p)
    pix_x = (
        (tile_ids % tiles_x)[:, None] * tile_size + (within % tile_size)[None, :]
    ).astype(params_t.dtype)
    pix_y = (
        (tile_ids // tiles_x)[:, None] * tile_size + (within // tile_size)[None, :]
    ).astype(params_t.dtype)

    chunks = params_t.reshape(num_tiles, f, n_chunks, chunk).transpose(2, 0, 1, 3)

    @jax.checkpoint
    def body(carry, ck):  # ck: (T, F, C)
        trans, acc = carry  # (T, P), (T, P, CH_PAD)
        mx = ck[:, 0, :, None]  # (T, C, 1)
        my = ck[:, 1, :, None]
        ca = ck[:, 2, :, None]
        cb = ck[:, 3, :, None]
        cc = ck[:, 4, :, None]
        op = ck[:, 5, :, None]
        dx = pix_x[:, None, :] - mx  # (T, C, P)
        dy = pix_y[:, None, :] - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(power))
        alpha = jnp.where((power <= 0) & (alpha >= MIN_ALPHA), alpha, 0.0)

        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)
        t_before = trans[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        )
        weight = alpha * t_before  # (T, C, P)
        colors = jnp.pad(ck[:, 6:, :], ((0, 0), (0, CH_PAD - (f - 6)), (0, 0)))
        acc = acc + jnp.einsum("tcp,txc->tpx", weight, colors)
        trans = trans * cum[:, -1]
        return (trans, acc), None

    trans0 = jnp.ones((num_tiles, p), params_t.dtype)
    acc0 = jnp.zeros((num_tiles, p, CH_PAD), params_t.dtype)
    (trans, acc), _ = jax.lax.scan(body, (trans0, acc0), chunks)
    return acc, trans


# ---------------------------------------------------------------------------
# Pallas pipeline: one custom-VJP boundary spanning u16 pack -> row gather
# -> compositing kernel, so no f32 gather or (T, F, K) transpose ever
# materializes (both are ~10x slower than their u16 / gather-free
# equivalents on TPU; see tile_gather.fast_gather_rows).


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _composite_packed(
    packed, idx_flat, block_start, counts, tiles_x, max_blocks, used_cols, chunk
):
    """packed: (g+1, F) f32 parameter table; idx_flat: (budget,) int32
    flat chunk-aligned per-tile row-id lists (sentinel g for pad slots);
    block_start/counts: (T,) per-tile chunk base and list length.
    Returns (acc (T,CH_PAD,P), trans (T,P))."""
    return _composite_packed_fwd(
        packed, idx_flat, block_start, counts, tiles_x, max_blocks, used_cols,
        chunk,
    )[0]


def _gather_params_u16(packed, idx_flat, chunk=128):
    from .pallas_composite import F as PF

    table_u = pack_table_u16(packed)  # (g+1, 2F) u16
    rows_u = table_u[idx_flat]  # (budget, 2F) — 16-bit fast-path gather
    # The kernel wants contiguous (2F, chunk) blocks (a strided chunk
    # read left it DMA-latency-bound); the local transpose fuses into the
    # gather's output layout assignment (measured free on v5e).
    blocks = rows_u.reshape(-1, chunk, 2 * PF)
    return blocks.transpose(0, 2, 1)  # (budget/chunk, 2F, chunk)


def _composite_packed_fwd(
    packed, idx_flat, block_start, counts, tiles_x, max_blocks, used_cols, chunk
):
    from .pallas_composite import pallas_composite_core

    params_u = _gather_params_u16(packed, idx_flat, chunk)
    acc, trans, n_proc = pallas_composite_core(
        params_u, counts, block_start, tiles_x, max_blocks
    )
    residuals = (
        params_u, idx_flat, block_start, counts, n_proc, trans, packed.shape[0]
    )
    return (acc, trans), residuals


def _composite_packed_bwd(
    tiles_x, max_blocks, used_cols, chunk, residuals, cotangents
):
    from .pallas_backward import pallas_composite_bwd
    from .pallas_composite import NPROC_CH, TRANS_CH
    from .tile_gather import segment_sum_rows

    params_u, idx_flat, block_start, counts, n_proc, trans, rows = residuals
    g_acc, g_trans = cotangents  # g_acc: (T, CH_PAD, P)
    packed_g = (
        g_acc.at[:, NPROC_CH, :].set(trans).at[:, TRANS_CH, :].set(g_trans)
    )
    d_params = pallas_composite_bwd(
        params_u, n_proc, block_start, packed_g, tiles_x, max_blocks,
        counts=counts,
    )
    # (budget/C, F, C) chunk blocks -> (budget, F) rows. Only the
    # geometry + active color columns carry nonzero gradients; each
    # dropped column removes a payload operand from the segment sort.
    d_rows = d_params.transpose(0, 2, 1).reshape(-1, F)[:, :used_cols]
    # Blocks not owned by any tile (tail margin, budget-dropped regions)
    # are never written by the backward kernel and hold uninitialized
    # f32. Binning guarantees their idx slots are the sentinel (rows-1),
    # whose gradient row is discarded by pack_columns' pad VJP — but
    # rather than lean on that cross-module invariant, zero every
    # sentinel-slot row here so garbage can never reach a live gradient.
    d_rows = jnp.where((idx_flat < rows - 1)[:, None], d_rows, 0.0)
    d_packed = segment_sum_rows(d_rows, idx_flat, rows)
    d_packed = jnp.pad(d_packed, ((0, 0), (0, F - used_cols)))
    return d_packed, None, None, None


_composite_packed.defvjp(_composite_packed_fwd, _composite_packed_bwd)


def composite_tiles(
    projected: ProjectedGaussians,
    tiles: TileLists,
    image_shape: tuple[int, int],
    background: jax.Array,  # (channels,)
    tile_size: int = 16,
    chunk: int = 128,
    capacity: int = 4096,
    backend: str = "auto",  # auto | pallas | xla
) -> jax.Array:
    """Returns (channels, h, w) composited image. `capacity` must match
    the binning capacity (bounds per-tile list length)."""
    h, w = image_shape
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    channels = projected.color.shape[0]
    num_tiles = tiles.block_start.shape[0]
    p = tile_size * tile_size
    g = projected.depth.shape[0]

    use_pallas = jax.default_backend() != "cpu" and (
        backend == "pallas"
        or (backend == "auto" and tile_size == 16 and chunk == 128)
    )
    if use_pallas:
        packed = pack_columns(projected)
        # One quarter-burst of sentinel margin so the kernel's lookahead
        # DMA for the last tile never reads past the buffer.
        idx = jnp.concatenate(
            [tiles.flat, jnp.full((8 * chunk,), g, tiles.flat.dtype)]
        )
        acc, trans = _composite_packed(
            packed,
            idx,
            tiles.block_start,
            tiles.counts,
            tiles_x,
            -(-capacity // chunk),
            6 + channels,
            chunk,
        )  # acc: (T, CH_PAD, P)
        image = (
            acc[:, :channels, :]
            + trans[:, None, :] * background[None, :, None]
        )
        image = image.reshape(tiles_y, tiles_x, channels, tile_size, tile_size)
        image = image.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * tile_size, tiles_x * tile_size
        )
        return image[:, :h, :w]

    params_t, counts = build_tile_params(
        projected, tiles, chunk=chunk, capacity=capacity
    )
    acc, trans = _xla_composite_core(
        params_t, counts, tiles_x, tile_size=tile_size, chunk=chunk
    )
    image = acc[..., :channels] + trans[..., None] * background[None, None, :]
    image = image.reshape(tiles_y, tiles_x, tile_size, tile_size, channels)
    image = image.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * tile_size, tiles_x * tile_size, channels
    )
    return image[:h, :w].transpose(2, 0, 1)
