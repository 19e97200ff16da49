"""Device-timeline timings for segment_sum_rows variants (bwd hot path)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices(), flush=True)

from pixelsplat_tpu.ops.rasterizer.tile_gather import (
    _segment_bounds_merge,
    fast_gather_rows,
)

N, F, ROWS = 820224, 12, 393218
rng = np.random.default_rng(0)
idx_np = rng.integers(0, ROWS, N).astype(np.int32)
blocks = jax.device_put(
    jnp.asarray(rng.normal(size=(N // 128, F, 128)).astype(np.float32))
)
idx = jax.device_put(jnp.asarray(idx_np))


def variant_current(blocks, idx):
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    flat = idx
    pos = jnp.arange(N, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort((flat, pos), num_keys=1, is_stable=False)
    sorted_rows = fast_gather_rows(d_rows, perm)
    csum = jnp.concatenate(
        [jnp.zeros((1, F), sorted_rows.dtype), jnp.cumsum(sorted_rows, axis=0)]
    )
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def variant_transposed_cumsum(blocks, idx):
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    pos = jnp.arange(N, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort((idx, pos), num_keys=1, is_stable=False)
    sorted_rows = fast_gather_rows(d_rows, perm)
    # Explicit transposes around the cumsum so the gather output and the
    # scan each get their preferred layout via one streaming relayout.
    ct = jnp.cumsum(sorted_rows.T, axis=1)  # (F, N)
    csum = jnp.concatenate([jnp.zeros((F, 1), ct.dtype), ct], axis=1).T
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def variant_barrier(blocks, idx):
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    d_rows = jax.lax.optimization_barrier(d_rows)
    pos = jnp.arange(N, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort((idx, pos), num_keys=1, is_stable=False)
    sorted_rows = fast_gather_rows(d_rows, perm)
    csum = jnp.concatenate(
        [jnp.zeros((1, F), sorted_rows.dtype), jnp.cumsum(sorted_rows, axis=0)]
    )
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def variant_sort_rows_as_payload(blocks, idx):
    # Carry the u16 row halves through the index sort as payloads: no
    # permute gather at all (the bitonic sort moves 24 u16 payloads).
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    bits = jax.lax.bitcast_convert_type(d_rows, jnp.uint16)  # (N, F, 2)
    ops = [idx] + [bits[:, i, j] for i in range(F) for j in range(2)]
    sorted_all = jax.lax.sort(ops, num_keys=1, is_stable=False)
    sorted_idx = sorted_all[0]
    halves = jnp.stack(sorted_all[1:], axis=-1).reshape(N, F, 2)
    sorted_rows = jax.lax.bitcast_convert_type(halves, jnp.float32)
    csum = jnp.concatenate(
        [jnp.zeros((1, F), sorted_rows.dtype), jnp.cumsum(sorted_rows, axis=0)]
    )
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def _force_row_major_u16(x):
    """Pallas identity copy: custom calls take default (row-major)
    layouts, so this anchors the surrounding XLA graph to materialize
    `x` row-major (one streaming relayout) instead of running gathers
    against a column-major table (~4x slower per row)."""
    import functools

    from jax.experimental import pallas as pl

    n, m = x.shape
    blk = 1024
    pad = (-n) % blk

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    xp = jnp.pad(x, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=((n + pad) // blk,),
        in_specs=[pl.BlockSpec((blk, m), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad, m), x.dtype),
    )(xp)
    return out[:n]


def _gather_forced(table_f32, indices):
    bits = jax.lax.bitcast_convert_type(table_f32, jnp.uint16)
    u = jnp.concatenate([bits[..., 1], bits[..., 0]], axis=-1)
    u = _force_row_major_u16(u)
    rows = u[indices]
    f = table_f32.shape[-1]
    hi = rows[..., :f].astype(jnp.uint32)
    lo = rows[..., f:].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hi << 16) | lo, table_f32.dtype)


def variant_forced_layout(blocks, idx):
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    pos = jnp.arange(N, dtype=jnp.int32)
    sorted_idx, perm = jax.lax.sort((idx, pos), num_keys=1, is_stable=False)
    sorted_rows = _gather_forced(d_rows, perm)
    csum = jnp.concatenate(
        [jnp.zeros((1, F), sorted_rows.dtype), jnp.cumsum(sorted_rows, axis=0)]
    )
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = _gather_forced(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def variant_u32_payload_sort(blocks, idx):
    # Columns of the col-major d_rows are contiguous: carry them as u32
    # sort payloads (no permute gather), 1-D cumsum per column, then one
    # row-major bounds gather.
    d_rows = blocks.transpose(0, 2, 1).reshape(-1, F)
    bits = jax.lax.bitcast_convert_type(d_rows, jnp.uint32)  # (N, F)
    ops = [idx] + [bits[:, i] for i in range(F)]
    sorted_all = jax.lax.sort(ops, num_keys=1, is_stable=False)
    sorted_idx = sorted_all[0]
    csums = []
    for c in sorted_all[1:]:
        cf = jax.lax.bitcast_convert_type(c, jnp.float32)
        csums.append(
            jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(cf)])
        )
    csum = jnp.stack(csums, axis=-1)  # (N + 1, F)
    bounds = _segment_bounds_merge(sorted_idx, ROWS - 1)
    at_bounds = fast_gather_rows(csum, bounds)
    return at_bounds[1:] - at_bounds[:-1]


def profile(fn, name):
    jfn = jax.jit(fn)
    np.asarray(jfn(blocks, idx))
    shutil.rmtree("/tmp/seg_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/seg_trace"):
        np.asarray(jfn(blocks, idx))
    files = glob.glob("/tmp/seg_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
        and "XLA" not in e.get("args", {}).get("name", "").upper()
    }
    total = sum(
        e.get("dur", 0) / 1e3
        for e in events
        if e.get("ph") == "X" and e.get("pid") in tpu_pids
    )
    print(f"{name:28s} {total:7.2f} ms", flush=True)
    return total


ref = np.asarray(jax.jit(variant_current)(blocks, idx))
if not os.environ.get("SEG_DETAIL"):
    for fn, name in [
        (variant_current, "current"),
        (variant_forced_layout, "forced_layout"),
        (variant_u32_payload_sort, "u32_payload_sort"),
    ]:
        got = np.asarray(jax.jit(fn)(blocks, idx))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 1e-5, (name, err)
        profile(fn, name)


def profile_detailed(fn, name):
    jfn = jax.jit(fn)
    np.asarray(jfn(blocks, idx))
    shutil.rmtree("/tmp/seg_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/seg_trace"):
        np.asarray(jfn(blocks, idx))
    files = glob.glob("/tmp/seg_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
        and "XLA" not in e.get("args", {}).get("name", "").upper()
    }
    by = defaultdict(float)
    longs = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            by[e.get("name", "?")] += e.get("dur", 0) / 1e3
            a = e.get("args", {})
            ln = a.get("long_name") or a.get("tf_op") or ""
            if ln:
                longs.setdefault(e.get("name", "?"), ln)
    print(f"== {name}", flush=True)
    for n_, d in sorted(by.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {d:7.2f} ms {n_[:40]} | {longs.get(n_, '')[:100]}", flush=True)


if os.environ.get("SEG_DETAIL"):
    profile_detailed(variant_forced_layout, "forced_layout")
