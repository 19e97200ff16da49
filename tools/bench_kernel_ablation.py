"""Ablation timings of the Pallas compositor's per-chunk stages.

Builds the bench.py scene's real tile lists, then times kernel variants
with individual stages stubbed out (numerically wrong, shape-preserving)
to attribute the per-chunk cost. The while loop is replaced by a
fixed-trip fori over all chunks so every variant does identical trips
(early exit does not fire on this scene anyway).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)

from pixelsplat_tpu.ops.rasterizer.binning import bin_gaussians
from pixelsplat_tpu.ops.rasterizer.composite import (
    _gather_params_u16,
    pack_columns,
)
from pixelsplat_tpu.ops.rasterizer.pallas_composite import (
    C,
    CH_PAD,
    F,
    MAX_ALPHA,
    MIN_ALPHA,
    NPROC_CH,
    P,
    TILE,
    TRANS_CH,
    split_matmul,
    unpack_rows,
)
from pixelsplat_tpu.ops.rasterizer.projection import project_gaussians

G = 2 * 256 * 256 * 3
rng = np.random.default_rng(0)
means = np.stack(
    [rng.uniform(-2, 2, G), rng.uniform(-2, 2, G), rng.uniform(1.2, 12, G)], -1
).astype(np.float32)
axes = rng.normal(size=(G, 3, 3)).astype(np.float32) * 0.01
covs = axes @ axes.transpose(0, 2, 1) + 1e-6 * np.eye(3, dtype=np.float32)
sh = rng.normal(size=(G, 3, 25)).astype(np.float32) * 0.1
opac = rng.uniform(0.05, 0.6, G).astype(np.float32)
K = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
extr = jnp.eye(4)
IM = (256, 256)

# Pass the big arrays as jit ARGUMENTS: closed-over constants get baked
# into the program and shipped through the ~60 MB/s axon tunnel (~138 MB
# of scene data = minutes of apparent hang).
jm, jc, jsh, jo = (
    jax.device_put(a) for a in map(jnp.asarray, (means, covs, sh, opac))
)


@functools.partial(jax.jit, static_argnums=())
def prep(m, c, s, o):
    proj = project_gaussians(extr, K, IM, m, c, o, harmonics=s)
    tiles = bin_gaussians(proj, IM, capacity=4096, big_capacity=128)
    g = proj.depth.shape[0]
    packed = pack_columns(proj)
    idx = tiles.indices
    k_ = idx.shape[-1]
    idx = jnp.pad(idx, ((0, 0), (0, (-k_) % C)), constant_values=g)
    counts = (tiles.indices < g).sum(axis=1).astype(jnp.int32)
    params_u = _gather_params_u16(packed, idx.reshape(-1), counts.shape[0])
    return params_u, counts


params_u, counts = prep(jm, jc, jsh, jo)
params_u = jax.block_until_ready(params_u)
print(
    "params_u %s, counts mean %.0f chunks mean %.1f"
    % (params_u.shape, counts.mean(), (counts / C).mean()),
    flush=True,
)


def _kernel_variant(
    counts_ref,
    tiles_x_ref,
    params_hbm,
    out_ref,
    scratch,
    sems,
    *,
    quarter: int,
    tiles_per_program: int,
    drop: frozenset,
):
    t0 = pl.program_id(0) * tiles_per_program
    tiles_x = tiles_x_ref[0]

    row_i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    lower = (col_j < row_i).astype(jnp.bfloat16)

    within = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xl = (within % TILE).astype(jnp.float32)
    yl = (within // TILE).astype(jnp.float32)
    basis = jnp.concatenate(
        [xl * xl, yl * yl, xl * yl, xl, yl, jnp.ones_like(xl),
         jnp.zeros_like(xl), jnp.zeros_like(xl)], axis=0,
    ).astype(jnp.bfloat16)

    def n_quarters_of(t):
        return pl.cdiv(pl.cdiv(counts_ref[t], C), quarter)

    def get_dma(slot, t, q):
        return pltpu.make_async_copy(
            params_hbm.at[t, pl.ds(q * quarter, quarter)],
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
        n_chunks = pl.cdiv(count, C)
        n_quarters = pl.cdiv(n_chunks, quarter)

        @pl.when(lt + 1 < tiles_per_program)
        def _():
            @pl.when(n_quarters_of(t + 1) > 0)
            def _():
                get_dma(1 - slot, t + 1, 0).start()

        tile_x0 = ((t % tiles_x) * TILE).astype(jnp.float32)
        tile_y0 = ((t // tiles_x) * TILE).astype(jnp.float32)

        def body(i, state):
            trans, acc = state

            @pl.when(i % quarter == 0)
            def _():
                q = i // quarter

                @pl.when(q + 1 < n_quarters)
                def _():
                    get_dma(slot, t, q + 1).start()

                get_dma(slot, t, q).wait()

            if "unpack" in drop:
                chunk = scratch[slot, i][:F].astype(jnp.int32).astype(jnp.float32)
            else:
                chunk = unpack_rows(scratch[slot, i])

            mxl = chunk[0, :][:, None] - tile_x0
            myl = chunk[1, :][:, None] - tile_y0
            ca = chunk[2, :][:, None]
            cb = chunk[3, :][:, None]
            cc = chunk[4, :][:, None]
            op = chunk[5, :][:, None]

            if "basis" in drop:
                power = -(ca + cb + cc) * jnp.ones((C, P), jnp.float32)
            else:
                const = (
                    -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
                )
                coef = jnp.concatenate(
                    [-0.5 * ca, -0.5 * cc, -cb,
                     ca * mxl + cb * myl, cc * myl + cb * mxl,
                     jnp.zeros_like(ca), jnp.zeros_like(ca),
                     jnp.zeros_like(ca)], axis=1,
                )
                c1 = coef.astype(jnp.bfloat16)
                r1 = coef - c1.astype(jnp.float32)
                c2 = r1.astype(jnp.bfloat16)
                if "split3" in drop:
                    power = (
                        jnp.dot(c1, basis, preferred_element_type=jnp.float32)
                        + jnp.dot(c2, basis, preferred_element_type=jnp.float32)
                        + const
                    )
                else:
                    c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)
                    power = (
                        jnp.dot(c1, basis, preferred_element_type=jnp.float32)
                        + jnp.dot(c2, basis, preferred_element_type=jnp.float32)
                        + jnp.dot(c3, basis, preferred_element_type=jnp.float32)
                        + const
                    )

            if "exp_power" in drop:
                alpha = jnp.clip(op * (1.0 + power * 0.01), 0.0, 0.02)
            else:
                alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(power))
                alpha = jnp.where(
                    (power <= 0.0) & (alpha >= MIN_ALPHA), alpha, 0.0
                )

            if "log1p" in drop:
                la = -alpha
            else:
                la = jnp.log1p(-alpha)
            if "prefix" in drop:
                excl = la
            else:
                excl = split_matmul(lower, la)
            if "exp_excl" in drop:
                t_before = trans * excl
            else:
                t_before = trans * jnp.exp(excl)
            weight = alpha * t_before

            colors = chunk[6 : 6 + CH_PAD, :]
            if "colors" in drop:
                acc = acc + weight[:CH_PAD, :]
            else:
                acc = acc + jnp.dot(
                    colors, weight, preferred_element_type=jnp.float32
                )
            if "exp_trans" in drop:
                trans = trans + jnp.sum(la, axis=0, keepdims=True) * 1e-9
            else:
                trans = trans * jnp.exp(jnp.sum(la, axis=0, keepdims=True))
            return trans, acc

        trans0 = jnp.ones((1, P), jnp.float32)
        acc0 = jnp.zeros((CH_PAD, P), jnp.float32)
        if "while_exit" in drop:
            # Production-style loop: lagged scalar exit check per chunk.
            def cond(st):
                i, tmax_prev, trans, acc = st
                return jnp.logical_and(i < n_chunks, tmax_prev >= 1e-4)

            def wbody(st):
                i, tmax_prev, trans, acc = st
                trans, acc = body(i, (trans, acc))
                return i + 1, jnp.max(trans), trans, acc

            _, _, trans, acc = jax.lax.while_loop(
                cond, wbody, (0, jnp.float32(1.0), trans0, acc0)
            )
        elif "quarter_exit" in drop:
            # Hybrid: fori over chunks inside each quarter, scalar exit
            # check once per quarter.
            def qcond(st):
                q, tmax_prev, trans, acc = st
                return jnp.logical_and(q < n_quarters, tmax_prev >= 1e-4)

            def qbody(st):
                q, tmax_prev, trans, acc = st
                hi = jnp.minimum((q + 1) * quarter, n_chunks)
                trans, acc = jax.lax.fori_loop(
                    q * quarter, hi, body, (trans, acc)
                )
                return q + 1, jnp.max(trans), trans, acc

            _, _, trans, acc = jax.lax.while_loop(
                qcond, qbody, (0, jnp.float32(1.0), trans0, acc0)
            )
        else:
            trans, acc = jax.lax.fori_loop(0, n_chunks, body, (trans0, acc0))

        waited = n_quarters

        @pl.when(waited < n_quarters)
        def _():
            get_dma(slot, t, waited).wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (CH_PAD, P), 0)
        acc = jnp.where(rows == NPROC_CH, 0.0, acc)
        acc = jnp.where(rows == TRANS_CH, trans, acc)
        out_ref[lt] = acc
        return 0

    jax.lax.fori_loop(0, tiles_per_program, tile_body, 0)


def run_variant(drop=()):
    drop = frozenset(drop)
    num_tiles, n_blocks, f2, c = params_u.shape
    quarter = next(q for q in (8, 4, 2, 1) if n_blocks % q == 0)
    tpb = next(q for q in (16, 8, 4, 2, 1) if num_tiles % q == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tpb, CH_PAD, P), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_blocks, 2 * F, C), jnp.uint16),
            pltpu.SemaphoreType.DMA((2, n_blocks // quarter)),
        ],
    )

    def call(pu, cnt):
        return pl.pallas_call(
            functools.partial(
                _kernel_variant, quarter=quarter, tiles_per_program=tpb,
                drop=drop,
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, CH_PAD, P), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(cnt, jnp.asarray([16], jnp.int32), pu)

    N = 10

    @jax.jit
    def many(pu, cnt):
        # Serial data dependence (counts perturbed by a runtime-zero
        # derived from the previous result) so XLA can neither CSE nor
        # hoist the kernel call out of the timing loop.
        def body(i, carry):
            z, c = carry
            r = call(pu, c)
            bump = (r[0, 0, 0] > 1e30).astype(jnp.int32)
            return (z + r[0, 0, 0], c + bump)

        z, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0.0), cnt))
        return z

    np.asarray(many(params_u, counts))  # compile + warm
    # Wall timings through the axon tunnel are unreliable; read the
    # device timeline instead and take the pallas op's own duration.
    import glob
    import gzip
    import json
    import shutil
    from collections import defaultdict

    trace_dir = "/tmp/ablation_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        np.asarray(many(params_u, counts))
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace produced"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "XLA" not in name.upper():
                tpu_pids.add(e["pid"])
    by_op = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            by_op[e.get("name", "?")] += e.get("dur", 0) / 1e3
    kernel = max(
        (v for k, v in by_op.items() if "custom" in k or "pallas" in k.lower()
         or k.startswith("closed_call")),
        default=sum(by_op.values()),
    )
    return kernel / N


floor = None
for name, drop in [
    ("full", ()),
    ("while_exit(production)", ("while_exit",)),
    ("quarter_exit", ("quarter_exit",)),
    ("-unpack", ("unpack",)),
    ("-basis(all exponent mm)", ("basis",)),
    ("-split3(2-way exponent)", ("split3",)),
    ("-exp_power", ("exp_power",)),
    ("-log1p", ("log1p",)),
    ("-prefix_mm", ("prefix",)),
    ("-exp_excl", ("exp_excl",)),
    ("-colors_mm", ("colors",)),
    ("-exp_trans", ("exp_trans",)),
    ("-all_exp", ("exp_power", "exp_excl", "exp_trans", "log1p")),
    ("-everything", ("unpack", "basis", "exp_power", "log1p", "prefix",
                     "exp_excl", "colors", "exp_trans")),
]:
    dt = run_variant(drop)
    print("%-26s %7.3f ms" % (name, dt), flush=True)
