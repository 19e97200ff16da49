"""Row gather with a sort-based backward (replaces XLA scatter-add).

`build_tile_params` gathers per-tile parameter rows `packed[indices]`; its
autodiff backward is a scatter-add over ~1M rows, which XLA lowers to an
expensive sorted-scatter on TPU (~57 ms/view at production scale — the
dominant backward cost, mirroring the atomics in the CUDA backward,
/root/reference's diff-gaussian-rasterization BACKWARD::render).

Here the backward is expressed with TPU-friendly primitives instead:

1. sort the flat indices once, carrying the source position as payload;
2. gather the cotangent rows into index-sorted order (row gathers are fast);
3. running prefix sum over the sorted rows;
4. per-output-row segment sums are differences of prefix sums at segment
   bounds, found either with `searchsorted` or a tag-stable merge sort
   (binary search costs log(n) serial gather rounds; the merge rides the
   same bitonic sorter as step 1).

Numerics: the prefix-sum difference can lose ~sqrt(n)·eps of relative
precision vs. true per-segment sums. Gradients at this scale tolerate it
(validated against the XLA scatter in tests), but the exact XLA path stays
the default on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bounds strategy for the backward: "searchsorted" | "merge".
BOUNDS_MODE = "merge"


def fast_gather_rows(table: jax.Array, indices: jax.Array) -> jax.Array:
    """Bit-exact `table[indices]` via a uint16 bitcast.

    XLA's TPU gather emitter is ~10x slower for 32-bit element types than
    for 16-bit ones (measured on v5e, tools/bench_gather.py: 1.05M rows of
    (g, 16) f32 take 21.4 ms; the same bytes as flat (g, 32) u16 rows take
    2.1 ms at ~32 GB/s). The table is split once into [high-halves |
    low-halves] column blocks — keeping the gathered rows 2-D, since a
    (g, f, 2) table shape falls off the fast path (90 ms) and a post-
    gather minor-dim reshape costs another ~4 ms — and the f32 rows are
    rebuilt with shifts, preserving every bit.
    """
    assert table.dtype.itemsize == 4, table.dtype
    bits = jax.lax.bitcast_convert_type(table, jnp.uint16)  # (rows, f, 2)
    # XLA bitcast-convert puts the low-order bits at minor index 0.
    u = jnp.concatenate([bits[..., 1], bits[..., 0]], axis=-1)  # (rows, 2f)
    rows = u[indices]  # (..., 2f)
    f = table.shape[-1]
    hi = rows[..., :f].astype(jnp.uint32)
    lo = rows[..., f:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, table.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(packed: jax.Array, indices: jax.Array) -> jax.Array:
    """packed: (rows, f); indices: (...,) int32 in [0, rows) -> (..., f)."""
    return fast_gather_rows(packed, indices)


def _gather_rows_fwd(packed, indices):
    return fast_gather_rows(packed, indices), (indices, packed.shape[0])


def _segment_bounds_searchsorted(sorted_idx: jax.Array, rows: int) -> jax.Array:
    return jnp.searchsorted(sorted_idx, jnp.arange(rows + 1, dtype=jnp.int32))


def _segment_bounds_merge(sorted_idx: jax.Array, rows: int) -> jax.Array:
    """bounds[i] = #sorted_idx < i, via two single-array merge sorts.

    Probes merge in front of equal data keys; a second sort compresses
    the probes back out front in key order, so each probe's merged
    position minus its rank is its bound. Tags and positions are packed
    into the sort keys' low bits (a separate payload array rides through
    every bitonic pass, ~2x the sort cost), falling back to multi-array
    sorts when the packed key would overflow int32.
    """
    n = sorted_idx.shape[0]
    merged = n + rows + 1
    probes = jnp.arange(rows + 1, dtype=sorted_idx.dtype)
    pos_bits = max(merged - 1, 1).bit_length()
    packable = (
        sorted_idx.dtype == jnp.int32
        and (rows + 1) << 1 < 2**31
        and (1 << (pos_bits + 1)) < 2**31
    )
    if packable:
        # Sort 1: key2 = key << 1 | tag; probes (tag 0) sort before equal
        # data keys. Sort 2: key3 = tag << pos_bits | merged_pos; probes
        # come out first, in merged (== key) order.
        key2 = jnp.concatenate(
            [(sorted_idx << 1) | 1, probes << 1]
        )
        (skey2,) = jax.lax.sort((key2,), num_keys=1, is_stable=False)
        tags = skey2 & 1
        key3 = (tags << pos_bits) | jnp.arange(merged, dtype=jnp.int32)
        (skey3,) = jax.lax.sort((key3,), num_keys=1, is_stable=False)
        probe_merged = skey3[: rows + 1] & ((1 << pos_bits) - 1)
        return probe_merged - probes.astype(jnp.int32)

    keys = jnp.concatenate([sorted_idx, probes])
    tags = jnp.concatenate(
        [jnp.ones(n, jnp.int32), jnp.zeros(rows + 1, jnp.int32)]
    )
    _, stags, _ = jax.lax.sort(
        (keys, tags, jnp.arange(merged, dtype=jnp.int32)), num_keys=2
    )
    _, probe_merged = jax.lax.sort(
        (stags, jnp.arange(merged, dtype=jnp.int32)), num_keys=1
    )
    return probe_merged[: rows + 1] - probes.astype(jnp.int32)


def segment_sum_rows(
    d_rows: jax.Array, indices: jax.Array, rows: int
) -> jax.Array:
    """sum of d_rows (n, f) into (rows, f) by index — the scatter-add the
    CUDA backward does with atomics, as sort + prefix-sum differences.

    The rows ride through the index sort as u32 bit-pattern payload
    columns instead of being permuted by a separate row gather
    afterwards: d_rows arrives column-major from the backward kernel's
    (blocks, f, chunk) transpose, which drops XLA's u16 row gather to
    ~1/4 speed (strided 2-byte reads), while column slices of that
    layout are contiguous and the bitonic sort moves them at streaming
    bandwidth (measured 7.4 -> 4.4 ms at 820k rows x 12 columns).
    """
    n, f = d_rows.shape
    flat = indices.reshape(-1).astype(jnp.int32)
    # Unstable: ties (same output row) are summed anyway, and XLA's stable
    # sort carries an extra tiebreaker array through every pass.
    bits = jax.lax.bitcast_convert_type(d_rows, jnp.uint32)  # (n, f)
    sorted_all = jax.lax.sort(
        [flat] + [bits[:, i] for i in range(f)], num_keys=1, is_stable=False
    )
    sorted_idx = sorted_all[0]
    sorted_rows = jax.lax.bitcast_convert_type(
        jnp.stack(sorted_all[1:], axis=-1), jnp.float32
    )
    csum = jnp.concatenate(
        [jnp.zeros((1, f), sorted_rows.dtype), jnp.cumsum(sorted_rows, axis=0)]
    )
    if BOUNDS_MODE == "merge":
        bounds = _segment_bounds_merge(sorted_idx, rows)
    else:
        bounds = _segment_bounds_searchsorted(sorted_idx, rows)
    # One gather + diff, not two gathers (each row gather of (rows, f)
    # from the prefix table costs ~2.5 ms at production scale).
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def _gather_rows_bwd(residuals, d_out):
    indices, rows = residuals
    f = d_out.shape[-1]
    d_packed = segment_sum_rows(d_out.reshape(-1, f), indices, rows)
    return d_packed, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
