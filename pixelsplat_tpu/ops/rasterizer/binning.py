"""Tile binning for the splatting rasterizer: static-shaped, sort-based.

The CUDA reference duplicates each Gaussian per overlapped 16x16 tile into a
dynamically-sized buffer and radix-sorts (tile, depth) keys. On TPU we need
static shapes, so the design is:

1. emit up to `span`^2 (gaussian, tile) candidate pairs per Gaussian as
   packed integer keys `tile_id << depth_bits | quantized_depth` — the
   top bits of the positive-f32 depth's bit pattern order exactly like
   the float, so no global depth argsort or rank bookkeeping exists at
   all (invalid slots get a sentinel that sorts to the end); when the
   tile count leaves < 12 depth bits, the sort instead takes (tile_id,
   exact depth pattern) as a two-word lexicographic key;
2. one single-key sort (Gaussian id as payload) puts pairs in
   (tile-major, depth) order;
3. per-tile segments are recovered with searchsorted and written at
   chunk-aligned offsets of one flat budgeted array (overflow drops the
   *farthest* Gaussians).

Gaussians spanning more than `span`x`span` tiles ("big" ones — rare, close
to the camera) don't fit the pair budget; the nearest `big_capacity` of
them emit one extra pair key per tile, so the single global sort leaves
every tile's fixed-capacity list complete and depth-ordered (this matches
the CUDA rasterizer, which has no big/small split at all).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import MIN_ALPHA, ProjectedGaussians


class TileLists(NamedTuple):
    # Original Gaussian ids of all tiles' lists in one flat array:
    # tile t's front-to-back list occupies `chunk`-aligned slots
    # [block_start[t] * chunk, ...) with `counts[t]` real entries; pad
    # slots (and the tail margin) hold the sentinel id `g`. The flat
    # budgeted layout exists because the parameter-row gather that
    # consumes it is row-COUNT-bound (~1.9 ns/row regardless of width),
    # so gathering tiles * capacity slots wastes half the time on
    # sentinel rows of near-empty tiles.
    flat: jax.Array  # (pair_budget,) int32
    block_start: jax.Array  # (num_tiles,) int32 — chunk index of tile t
    counts: jax.Array  # (num_tiles,) int32 — list length (<= capacity)
    # Number of (gaussian, tile) pairs dropped due to capacity or budget
    # overflow — diagnostics for choosing `capacity` / `pair_budget`.
    overflow: jax.Array


def per_tile_indices(
    tiles: TileLists, capacity: int, g_sent: int, chunk: int = 128
) -> jax.Array:
    """Unflatten to (num_tiles, capacity) id lists (sentinel-padded).

    `g_sent` is the sentinel id (the Gaussian count g). Compatibility
    path for the XLA fallback compositor and tests; the Pallas path
    consumes the flat layout directly.
    """
    padded = jnp.concatenate(
        [tiles.flat, jnp.full((capacity,), g_sent, tiles.flat.dtype)]
    )

    def one(carry, s):
        return carry, jax.lax.dynamic_slice(padded, (s,), (capacity,))

    _, lists = jax.lax.scan(one, 0, tiles.block_start * chunk)
    k_range = jnp.arange(capacity, dtype=jnp.int32)
    return jnp.where(
        k_range[None, :] < tiles.counts[:, None], lists, g_sent
    )


def bin_gaussians(
    projected: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    capacity: int = 2048,
    span: int = 3,
    big_capacity: int = 128,
    chunk: int = 128,
    pair_budget: int | None = None,
    force_wide_keys: bool = False,
) -> TileLists:
    h, w = image_shape
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    num_tiles = tiles_x * tiles_y
    g = projected.depth.shape[0]
    big_capacity = min(big_capacity, g)
    capacity = min(capacity, g * span * span)

    # 1. Quantized depth bits, monotone in depth: positive f32 bit
    # patterns order like the floats, so the top `depth_bits` of the
    # pattern are a depth key directly — no global depth argsort and no
    # rank-recovery sort (two ~0.35 ms passes at 393k). Ties at 2^-15
    # relative depth get arbitrary compositing order; the CUDA reference
    # radix-sorts full 32-bit depth bits, where such pairs differ by less
    # than one blending ULP anyway.
    iota = jnp.arange(g, dtype=jnp.int32)
    mean_x, mean_y = projected.mean_x, projected.mean_y
    radius_x, radius_y = projected.radius_x, projected.radius_y
    valid = projected.valid

    # Precise ellipse-vs-tile test. The per-axis AABB (radius_x/y) covers
    # every pixel that can reach MIN_ALPHA, but a tilted ellipse overlaps
    # far fewer tiles than its AABB; a pair whose tile never reaches
    # alpha >= MIN_ALPHA is zeroed by every compositor (forward
    # pallas_composite.py:231 / composite.py:137, backward
    # pallas_backward.py:143), so culling it here is render- and
    # gradient-neutral up to f32 rounding at the alpha cutoff (a pair
    # whose peak alpha sits within ulps of 1/255 may round across the
    # threshold differently here than in the compositor's exp; the
    # error-scaled margin below biases every such case toward keeping
    # the pair, and any residual disagreement is bounded by one
    # sub-quantization alpha contribution of < 1/255). It shrinks the
    # per-tile lists the gather, compositing, and backward all iterate.
    # The CUDA reference bins the full (circular-radius) AABB
    # (diff-gaussian-rasterization preprocess); this is strictly tighter.
    #
    # min over the tile rect of q(p) = a dx^2 + 2 b dx dy + c dy^2 is at
    # the mean (if inside) or on one of the 4 edges; each edge's 1-D
    # minimizer is clamped to the edge segment (exact for an SPD conic).
    conic_a = jnp.maximum(projected.conic_a, 1e-12)
    conic_c = jnp.maximum(projected.conic_c, 1e-12)
    conic_b = projected.conic_b
    # alpha = op * exp(-q/2) >= MIN_ALPHA iff q <= t_cut (projection.py:154).
    t_cut = 2.0 * jnp.log(
        jnp.maximum(projected.opacity, MIN_ALPHA) / MIN_ALPHA
    )

    def tile_reaches_alpha(tx, ty, gid=None):
        """Whether alpha can reach MIN_ALPHA anywhere on tile (tx, ty).

        With `gid`, the Gaussian quantities are gathered at those indices
        (the big-Gaussian path evaluates a (num_tiles, big) grid).
        """
        if gid is None:
            mx, my, ca, cb, cc, t = mean_x, mean_y, conic_a, conic_b, conic_c, t_cut
        else:
            mx, my, ca, cb, cc, t = (
                jnp.take(v, gid, fill_value=0.0)
                for v in (mean_x, mean_y, conic_a, conic_b, conic_c, t_cut)
            )
        dx0 = tx.astype(jnp.float32) * tile_size - mx
        dx1 = dx0 + (tile_size - 1)
        dy0 = ty.astype(jnp.float32) * tile_size - my
        dy1 = dy0 + (tile_size - 1)
        inside = (dx0 <= 0) & (0 <= dx1) & (dy0 <= 0) & (0 <= dy1)

        def q_at(dx, dy):
            # q with cancellation headroom: for extreme anisotropy the
            # three terms are individually huge and nearly cancel, so f32
            # q carries absolute error ~ eps * (sum of term magnitudes).
            # That sum is <= 2 * (a dx^2 + c dy^2) since 2|b dx dy| <=
            # a dx^2 + c dy^2 for an SPD conic; lower q by a generous
            # multiple of it so rounding can only KEEP a borderline pair,
            # never cull one the compositor's own f32 exp would admit.
            q = (ca * dx + 2.0 * cb * dy) * dx + cc * dy * dy
            mag = ca * dx * dx + cc * dy * dy
            return q - (32.0 * jnp.finfo(jnp.float32).eps) * mag

        def q_edge_x(dx):
            return q_at(dx, jnp.clip(-cb * dx / cc, dy0, dy1))

        def q_edge_y(dy):
            return q_at(jnp.clip(-cb * dy / ca, dx0, dx1), dy)

        q_min = jnp.minimum(
            jnp.minimum(q_edge_x(dx0), q_edge_x(dx1)),
            jnp.minimum(q_edge_y(dy0), q_edge_y(dy1)),
        )
        return inside | (q_min <= t)

    # 2. Tile bbox per Gaussian (original order), from the opacity-aware
    # per-axis extents (see ProjectedGaussians.radius_x).
    x0 = jnp.clip(jnp.floor((mean_x - radius_x) / tile_size), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((mean_x + radius_x) / tile_size), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((mean_y - radius_y) / tile_size), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((mean_y + radius_y) / tile_size), 0, tiles_y - 1)
    x0, x1, y0, y1 = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    span_x = x1 - x0 + 1
    span_y = y1 - y0 + 1
    small = valid & (span_x <= span) & (span_y <= span)
    big = valid & ~small

    # 3. Emit packed pair keys (tile id in the high bits, quantized depth
    # in the low bits) for small Gaussians, with the original Gaussian id
    # as sort payload. int32 keys only — int64 silently truncates
    # without jax_enable_x64 (and uint32 keys measured ~10% slower in
    # XLA's sort); even 2048x2048 images leave 17 depth bits of relative
    # resolution. When the tile count leaves fewer than 12 depth bits
    # (images beyond ~11.5k^2 at 16px tiles), the key no longer packs:
    # fall back to a two-word (tile, depth) lexicographic sort — one
    # extra operand through the same single sort, with *exact* f32
    # depth order (the full 31-bit positive pattern).
    key_dtype = jnp.int32
    depth_bits = 31 - max((num_tiles + 1).bit_length(), 1)
    wide_keys = force_wide_keys or depth_bits < 12
    depth_pattern = jax.lax.bitcast_convert_type(
        jnp.maximum(projected.depth, 0.0), jnp.int32
    )
    dq_i32 = depth_pattern if wide_keys else depth_pattern >> (31 - depth_bits)
    dq = dq_i32.astype(key_dtype)
    tile_shift = jnp.asarray(1 << max(depth_bits, 0), key_dtype)
    sentinel_tile = jnp.asarray(num_tiles, key_dtype)
    keys = []
    tile_keys = []  # wide path: separate tile-id key word
    for slot in range(span * span):
        dx, dy = slot % span, slot // span
        tx = x0 + dx
        ty = y0 + dy
        slot_ok = (
            small & (dx < span_x) & (dy < span_y) & tile_reaches_alpha(tx, ty)
        )
        tile_id = (ty * tiles_x + tx).astype(key_dtype)
        if wide_keys:
            tile_keys.append(jnp.where(slot_ok, tile_id, sentinel_tile))
            keys.append(dq)
        else:
            keys.append(
                jnp.where(
                    slot_ok, tile_id * tile_shift + dq, sentinel_tile * tile_shift
                )
            )
    keys = jnp.concatenate(keys)
    if wide_keys:
        tile_keys = jnp.concatenate(tile_keys)
    payload = jnp.tile(iota, span * span)

    overflow = jnp.asarray(0, jnp.int32)
    if big_capacity > 0:
        # 4. Global "big Gaussian" list: the first big_capacity big ones
        # in depth order (sort+slice: XLA's top_k lowers to an 11 ms
        # negate-reduce at this size; a plain sort is ~10x cheaper). Each
        # joins the global pair sort once per tile, so the per-tile lists
        # come out depth-ordered with no separate merge pass.
        # dq < 2^31 always (top bit of a positive f32 pattern is 0), so
        # int32 holds it and 2^31 - 1 is a safe invalid sentinel.
        big_inf = jnp.asarray(2**31 - 1, jnp.int32)
        big_dq = jnp.where(big, dq_i32, big_inf)
        big_sorted, big_gid_sorted = jax.lax.sort(
            (big_dq, iota), num_keys=1, is_stable=False
        )
        big_dqs = big_sorted[:big_capacity]
        big_valid = big_dqs < big_inf
        big_gids = jnp.where(big_valid, big_gid_sorted[:big_capacity], g)
        overflow = overflow + jnp.maximum(big.sum() - big_capacity, 0)

        all_tiles = jnp.arange(num_tiles, dtype=key_dtype)
        # Each big Gaussian joins the global sort once per tile for
        # static shape, but only tiles inside its bbox that pass the
        # precise ellipse test get real keys — a big Gaussian's bbox is
        # typically a small fraction of the image, so this trims most of
        # the num_tiles x big_capacity candidate block.
        big_tx = (all_tiles % tiles_x)[:, None]
        big_ty = (all_tiles // tiles_x)[:, None]
        in_bbox = (
            (big_tx >= jnp.take(x0, big_gids, fill_value=1)[None, :])
            & (big_tx <= jnp.take(x1, big_gids, fill_value=-1)[None, :])
            & (big_ty >= jnp.take(y0, big_gids, fill_value=1)[None, :])
            & (big_ty <= jnp.take(y1, big_gids, fill_value=-1)[None, :])
        )
        big_ok = (
            big_valid[None, :]
            & in_bbox
            & tile_reaches_alpha(big_tx, big_ty, gid=big_gids[None, :])
        )
        if wide_keys:
            big_tiles = jnp.where(big_ok, all_tiles[:, None], sentinel_tile)
            tile_keys = jnp.concatenate([tile_keys, big_tiles.reshape(-1)])
            big_keys = jnp.broadcast_to(
                big_dqs.astype(key_dtype)[None, :], (num_tiles, big_capacity)
            )
            keys = jnp.concatenate([keys, big_keys.reshape(-1)])
        else:
            big_keys = jnp.where(
                big_ok,
                all_tiles[:, None] * tile_shift
                + big_dqs.astype(key_dtype)[None, :],
                sentinel_tile * tile_shift,
            )
            keys = jnp.concatenate([keys, big_keys.reshape(-1)])
        payload = jnp.concatenate(
            [
                payload,
                jnp.broadcast_to(
                    big_gids[None, :], (num_tiles, big_capacity)
                ).reshape(-1),
            ]
        )

    if wide_keys:
        seg_keys, _, payload = jax.lax.sort(
            (tile_keys, keys, payload), num_keys=2, is_stable=False
        )
        seg_step = jnp.asarray(1, key_dtype)
    else:
        seg_keys, payload = jax.lax.sort(
            (keys, payload), num_keys=1, is_stable=False
        )
        seg_step = tile_shift

    # 5. Per-tile segments + flat budgeted assembly. Each tile's list is
    # a CONTIGUOUS run of the sorted payload, read with a dynamic_slice
    # per tile (XLA's gather does not exploit contiguous indices: 8.8 ms
    # vs 2.0 ms at this size) and written at its chunk-aligned offset in
    # the flat array. Writes go in ascending tile order with a full
    # `capacity` window each: a tile's spill past its own (shorter)
    # padded segment lands in the next tile's region and is overwritten
    # by that tile's own write.
    starts = jnp.searchsorted(
        seg_keys, jnp.arange(num_tiles, dtype=key_dtype) * seg_step
    )
    ends = jnp.searchsorted(
        seg_keys, (jnp.arange(num_tiles, dtype=key_dtype) + 1) * seg_step
    )
    raw_counts = (ends - starts).astype(jnp.int32)
    counts = jnp.minimum(raw_counts, capacity)
    overflow = overflow + (raw_counts - counts).sum()

    if pair_budget is None:
        # Exact worst case (every candidate pair fits, plus one chunk of
        # alignment padding per tile) when that is small; otherwise twice
        # the Gaussian count, which covers scenes whose average
        # tile-overlap is < 2 (bench worst case: ~1.4) — overflow reports
        # when it doesn't. The floor keeps one chunk per tile plus
        # padding slack always available.
        worst = span * span * g + num_tiles * (big_capacity + chunk)
        floor = max(2 * g + num_tiles * chunk, 65536)
        pair_budget = min(worst, floor)
    pair_budget = -(-pair_budget // chunk) * chunk
    nb = pair_budget // chunk

    blocks = -(-counts // chunk)
    astart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blocks)[:-1].astype(jnp.int32)]
    )
    fits = (astart + blocks) <= nb
    overflow = overflow + jnp.where(fits, 0, counts).sum()
    counts = jnp.where(fits, counts, 0)
    # Budget-dropped tiles write into the tail margin instead.
    astart = jnp.where(fits, astart, nb)

    payload_padded = jnp.concatenate(
        [payload, jnp.full((capacity,), g, payload.dtype)]
    )
    k_range = jnp.arange(capacity, dtype=jnp.int32)

    def write_tile(out, xs):
        s, a, n = xs
        sl = jax.lax.dynamic_slice(payload_padded, (s,), (capacity,))
        sl = jnp.where(k_range < n, sl, g)
        return jax.lax.dynamic_update_slice(out, sl, (a * chunk,)), None

    out0 = jnp.full((pair_budget + capacity + chunk,), g, payload.dtype)
    out, _ = jax.lax.scan(
        write_tile, out0, (starts.astype(jnp.int32), astart, counts)
    )

    return TileLists(
        flat=out[:pair_budget],
        block_start=astart,
        counts=counts,
        overflow=overflow,
    )


def tile_occupancy(
    projected: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    span: int = 2,
    big_capacity: int = 256,
    chunk: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Conservative per-tile occupancy stats for this scene.

    Returns `(max_count, needed_budget)`: the maximum per-tile list
    length, and the exact flat-pair-array size (`sum over tiles of
    ceil(count / chunk) * chunk`) binning at `capacity >= max_count`
    would require. Both are upper bounds on what `bin_gaussians`
    produces (it additionally culls with the precise ellipse-vs-tile
    test; this pre-pass uses the bbox only), so rendering with
    `capacity >= max_count` and `pair_budget >= needed_budget` is
    overflow-free by construction.

    A cheap pre-pass for occupancy-adaptive rendering (adaptive.py): one
    single-key sort of the tile ids (no ranks, no payload), segment
    lengths via searchsorted, plus the big-Gaussian contribution (each of
    the nearest `big_capacity` big ones joins every tile's list).
    """
    h, w = image_shape
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    num_tiles = tiles_x * tiles_y
    g = projected.depth.shape[0]

    mean_x, mean_y = projected.mean_x, projected.mean_y
    radius_x, radius_y = projected.radius_x, projected.radius_y
    valid = projected.valid
    x0 = jnp.clip(jnp.floor((mean_x - radius_x) / tile_size), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((mean_x + radius_x) / tile_size), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((mean_y - radius_y) / tile_size), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((mean_y + radius_y) / tile_size), 0, tiles_y - 1)
    x0, x1, y0, y1 = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    span_x = x1 - x0 + 1
    span_y = y1 - y0 + 1
    small = valid & (span_x <= span) & (span_y <= span)
    n_big = (valid & ~small).sum()

    keys = []
    for slot in range(span * span):
        dx, dy = slot % span, slot // span
        slot_ok = small & (dx < span_x) & (dy < span_y)
        tile_id = (y0 + dy) * tiles_x + (x0 + dx)
        keys.append(jnp.where(slot_ok, tile_id, num_tiles))
    (sorted_ids,) = jax.lax.sort(
        (jnp.concatenate(keys),), num_keys=1, is_stable=False
    )
    bounds = jnp.searchsorted(
        sorted_ids, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    )
    counts = bounds[1:] - bounds[:-1] + jnp.minimum(n_big, big_capacity)
    needed_budget = (-(-counts // chunk) * chunk).sum()
    return counts.max(), needed_budget
