"""Tile binning for the splatting rasterizer: static-shaped, sort-based.

The CUDA reference duplicates each Gaussian per overlapped 16x16 tile into a
dynamically-sized buffer and radix-sorts (tile, depth) keys. On TPU we need
static shapes, so the design is:

1. argsort Gaussians by depth once (invalid ones pushed to the end);
2. emit up to `span`^2 (gaussian, tile) candidate pairs per Gaussian as
   packed integer keys `tile_id * G + depth_rank` (invalid slots get a
   sentinel that sorts to the end);
3. one stable single-key sort puts pairs in (tile-major, depth) order —
   depth rank rides in the low bits, so no payload array is needed;
4. per-tile segments are recovered with searchsorted, and fixed-capacity
   per-tile lists are gathered (overflow drops the *farthest* Gaussians).

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

from .projection import ProjectedGaussians


class TileLists(NamedTuple):
    # Original Gaussian ids per tile in front-to-back order; invalid slots
    # hold the sentinel id `g` (one past the last Gaussian).
    indices: jax.Array  # (num_tiles, capacity) int32
    valid: jax.Array  # (num_tiles, capacity) bool
    # Number of (gaussian, tile) pairs dropped due to capacity overflow —
    # diagnostics for choosing `capacity`.
    overflow: jax.Array


def bin_gaussians(
    projected: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    capacity: int = 2048,
    span: int = 3,
    big_capacity: int = 128,
) -> TileLists:
    h, w = image_shape
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    num_tiles = tiles_x * tiles_y
    g = projected.depth.shape[0]
    big_capacity = min(big_capacity, g)
    capacity = min(capacity, g * span * span)

    # 1. Depth ranks (invalid to the end). No physical reorder: ranks ride
    # in the key's low bits, so the bbox math below runs on the original
    # (structure-of-arrays) vectors with no gather at all. The rank of each
    # Gaussian is the inverse of the depth argsort permutation, recovered
    # with a second small sort.
    sort_key = jnp.where(projected.valid, projected.depth, jnp.inf)
    # stable=False everywhere: keys are unique (or ties don't matter), and
    # XLA's stable sort drags an extra iota tiebreaker array through every
    # bitonic pass.
    order = jnp.argsort(sort_key, stable=False).astype(jnp.int32)  # order[r] = gid
    iota = jnp.arange(g, dtype=jnp.int32)
    _, rank_of = jax.lax.sort(
        (order, iota), num_keys=1, is_stable=False
    )  # rank_of[gid] = r
    mean_x, mean_y = projected.mean_x, projected.mean_y
    radius = projected.radius
    valid = projected.valid

    # 2. Tile bbox per Gaussian (original order).
    x0 = jnp.clip(jnp.floor((mean_x - radius) / tile_size), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((mean_x + radius) / tile_size), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((mean_y - radius) / tile_size), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((mean_y + radius) / tile_size), 0, tiles_y - 1)
    x0, x1, y0, y1 = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    span_x = x1 - x0 + 1
    span_y = y1 - y0 + 1
    small = valid & (span_x <= span) & (span_y <= span)
    big = valid & ~small

    # 3. Emit packed pair keys (tile-major, depth rank in the low bits) for
    # small Gaussians, with the original Gaussian id as sort payload.
    key_dtype = jnp.int32 if (num_tiles + 1) * g < 2**31 else jnp.int64
    rank = rank_of.astype(key_dtype)  # depth rank of each original Gaussian
    sentinel = jnp.asarray(num_tiles, key_dtype) * g  # sorts after all real keys
    keys = []
    for slot in range(span * span):
        dx, dy = slot % span, slot // span
        tx = x0 + dx
        ty = y0 + dy
        slot_ok = small & (dx < span_x) & (dy < span_y)
        tile_id = (ty * tiles_x + tx).astype(key_dtype)
        keys.append(jnp.where(slot_ok, tile_id * g + rank, sentinel))
    keys = jnp.concatenate(keys)
    payload = jnp.tile(iota, span * span)

    overflow = jnp.asarray(0, jnp.int32)
    if big_capacity > 0:
        # 4. Global "big Gaussian" list: the first big_capacity big ones in
        # depth order (sort+slice: XLA's top_k lowers to an 11 ms
        # negate-reduce at this size; a plain sort is ~10x cheaper). Each
        # joins the global pair sort once per tile, so the per-tile lists
        # come out depth-ordered with no separate merge pass.
        big_key = jnp.where(big, rank.astype(jnp.int32), g)
        big_sorted, big_gid_sorted = jax.lax.sort(
            (big_key, iota), num_keys=1, is_stable=False
        )
        big_ranks = big_sorted[:big_capacity]
        big_valid = big_ranks < g
        big_gids = jnp.where(big_valid, big_gid_sorted[:big_capacity], g)
        overflow = overflow + jnp.maximum(big.sum() - big_capacity, 0)

        all_tiles = jnp.arange(num_tiles, dtype=key_dtype)
        big_keys = jnp.where(
            big_valid[None, :],
            all_tiles[:, None] * g + big_ranks.astype(key_dtype)[None, :],
            sentinel,
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

    keys, payload = jax.lax.sort((keys, payload), num_keys=1, is_stable=False)

    # 5. Per-tile segments + fixed-capacity assembly. Each tile's list is a
    # CONTIGUOUS run of the sorted payload, so it is read with a
    # dynamic_slice per tile instead of a gather — XLA's gather does not
    # exploit contiguous indices (8.8 ms vs 2.0 ms at this size).
    starts = jnp.searchsorted(keys, jnp.arange(num_tiles, dtype=key_dtype) * g)
    ends = jnp.searchsorted(keys, (jnp.arange(num_tiles, dtype=key_dtype) + 1) * g)
    counts = (ends - starts).astype(jnp.int32)
    k_range = jnp.arange(capacity, dtype=jnp.int32)
    payload_padded = jnp.concatenate(
        [payload, jnp.full((capacity,), g, payload.dtype)]
    )

    def slice_tile(carry, s):
        return carry, jax.lax.dynamic_slice(payload_padded, (s,), (capacity,))

    _, tile_gids = jax.lax.scan(slice_tile, 0, starts.astype(jnp.int32))
    tile_valid = k_range[None, :] < jnp.minimum(counts, capacity)[:, None]
    tile_gids = jnp.where(tile_valid, tile_gids, g)
    overflow = overflow + jnp.maximum(counts - capacity, 0).sum()

    return TileLists(
        indices=tile_gids,
        valid=tile_valid,
        overflow=overflow,
    )


def tile_occupancy(
    projected: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    span: int = 2,
    big_capacity: int = 256,
) -> jax.Array:
    """Exact maximum per-tile list length this scene would produce.

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
    radius = projected.radius
    valid = projected.valid
    x0 = jnp.clip(jnp.floor((mean_x - radius) / tile_size), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((mean_x + radius) / tile_size), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((mean_y - radius) / tile_size), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((mean_y + radius) / tile_size), 0, tiles_y - 1)
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
    counts = bounds[1:] - bounds[:-1]
    return counts.max() + jnp.minimum(n_big, big_capacity)
