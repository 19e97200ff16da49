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
to the camera) don't fit the pair budget; they are collected into a global
list of capacity `big_capacity` that is merged into every tile's list with
a per-tile re-sort by depth rank, preserving correct compositing order.
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

    # 1. Depth sort (invalid to the end). Pack the bbox inputs into one
    # matrix first so the depth permutation is a single row gather (per-
    # column gathers dominated the old profile).
    sort_key = jnp.where(projected.valid, projected.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    packed = jnp.stack(
        [
            projected.mean2d[:, 0],
            projected.mean2d[:, 1],
            projected.radius,
            projected.valid.astype(projected.mean2d.dtype),
        ],
        axis=-1,
    )[order]
    mean2d = packed[:, :2]
    radius = packed[:, 2]
    valid = packed[:, 3] > 0.5

    # 2. Tile bbox per (sorted) Gaussian.
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size), 0, tiles_y - 1)
    x0, x1, y0, y1 = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    span_x = x1 - x0 + 1
    span_y = y1 - y0 + 1
    small = valid & (span_x <= span) & (span_y <= span)
    big = valid & ~small

    # 3. Emit packed pair keys (tile-major, depth rank in the low bits) for
    # small Gaussians, with the original Gaussian id as sort payload.
    key_dtype = jnp.int32 if (num_tiles + 1) * g < 2**31 else jnp.int64
    rank = jnp.arange(g, dtype=key_dtype)
    gid = order.astype(jnp.int32)  # original id of each depth-sorted slot
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
    payload = jnp.tile(gid, span * span)
    keys, payload = jax.lax.sort((keys, payload), num_keys=1)

    # 4. Per-tile segments + fixed-capacity assembly. The key and the
    # payload (gid) ride the same positions, so one fused gather recovers
    # both (keys for depth-rank merge ordering, gids for the param lookup).
    starts = jnp.searchsorted(keys, jnp.arange(num_tiles, dtype=key_dtype) * g)
    ends = jnp.searchsorted(keys, (jnp.arange(num_tiles, dtype=key_dtype) + 1) * g)
    counts = (ends - starts).astype(jnp.int32)
    k_range = jnp.arange(capacity, dtype=jnp.int32)
    gather_pos = jnp.clip(
        starts.astype(jnp.int32)[:, None] + k_range[None, :], 0, keys.shape[0] - 1
    )
    packed_kv = jnp.stack(
        [(keys % g).astype(jnp.int32), payload], axis=-1
    )  # (n, 2)
    got = packed_kv[gather_pos]  # (T, K, 2) — one gather
    tile_ranks = got[..., 0]
    tile_gids = got[..., 1]
    tile_valid = k_range[None, :] < jnp.minimum(counts, capacity)[:, None]
    tile_gids = jnp.where(tile_valid, tile_gids, g)
    overflow = jnp.maximum(counts - capacity, 0).sum()

    if big_capacity > 0:
        # 5. Global "big Gaussian" list: the first big_capacity big ones in
        # depth order, merged into every tile then re-sorted by depth rank.
        # (sort+slice: XLA's top_k lowers to an 11 ms negate-reduce at this
        # size; a plain sort is ~10x cheaper.)
        big_key = jnp.where(big, rank, g)
        big_ranks = jnp.sort(big_key)[:big_capacity].astype(jnp.int32)
        big_valid = big_ranks < g
        big_gids = jnp.where(
            big_valid,
            jnp.concatenate([gid, jnp.asarray([g], jnp.int32)])[big_ranks],
            g,
        )
        big_overflow = jnp.maximum(big.sum() - big_capacity, 0)
        overflow = overflow + big_overflow

        merge_rank = jnp.concatenate(
            [
                jnp.where(tile_valid, tile_ranks, g),
                jnp.broadcast_to(
                    jnp.where(big_valid, big_ranks, g), (num_tiles, big_capacity)
                ),
            ],
            axis=1,
        )
        merge_gid = jnp.concatenate(
            [tile_gids, jnp.broadcast_to(big_gids, (num_tiles, big_capacity))],
            axis=1,
        )
        # Sort each tile's merged list by depth rank (invalid → end).
        sorted_rank, sorted_gid = jax.lax.sort(
            (merge_rank, merge_gid), dimension=1, num_keys=1
        )
        tile_gids = sorted_gid
        tile_valid = sorted_rank < g

    return TileLists(
        indices=tile_gids,
        valid=tile_valid,
        overflow=overflow,
    )
