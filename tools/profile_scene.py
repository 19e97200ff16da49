"""Device-timeline profile of the FULL bench.py scene program.

bench.py's headline times encode + 3-view render in ONE jitted program;
its encode/decode split bursts time the same stages as separate programs.
Round 5 measured the combined program ~12 ms/scene slower than the sum of
its split parts — this tool traces the combined program and aggregates
per-op SELF time so the gap is attributable (layout copies at the
encoder->decoder boundary are the prime suspect: jit outputs force default
layouts in the split programs, but the combined program lets XLA pick).

Usage: python tools/profile_scene.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pixelsplat_tpu.config import load_config
    from pixelsplat_tpu.model.decoder import get_decoder
    from pixelsplat_tpu.model.encoder import get_encoder
    from pixelsplat_tpu.ops.rasterizer.adaptive import choose_settings

    cfg = load_config(["+experiment=re10k"])
    encoder, _ = get_encoder(cfg.model.encoder)
    decoder = get_decoder(cfg.model.decoder)

    b, v, h, w = 1, 2, 256, 256
    key = jax.random.PRNGKey(0)
    context = {
        "image": jax.random.uniform(key, (b, v, 3, h, w)),
        "extrinsics": jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
        .at[:, 1, 0, 3]
        .set(0.8),
        "intrinsics": jnp.broadcast_to(
            jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
        ),
        "near": jnp.ones((b, v)),
        "far": jnp.full((b, v), 100.0),
    }
    tv = 3
    shifts = jnp.linspace(-0.3, 0.3, tv)
    t_extr = jnp.broadcast_to(jnp.eye(4), (b, tv, 4, 4)).at[:, :, 0, 3].set(
        shifts[None]
    )
    t_intr = jnp.broadcast_to(context["intrinsics"][:, :1], (b, tv, 3, 3))
    t_near = jnp.ones((b, tv))
    t_far = jnp.full((b, tv), 100.0)

    params = jax.jit(
        lambda r, c: encoder.init(r, c, jnp.asarray(0), False)
    )({"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}, context)

    @jax.jit
    def encode_scene(params, context, seed):
        return encoder.apply(
            params, context, jnp.asarray(0), False,
            rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(3), seed)},
        )

    g0 = encode_scene(params, context, jnp.int32(0))
    n_g = g0.means.shape[1]
    render_settings = choose_settings(
        t_extr[0], t_intr[0], t_near[0],
        jnp.broadcast_to(g0.means[:1], (tv, n_g, 3)),
        jnp.broadcast_to(g0.covariances[:1], (tv, n_g, 3, 3)),
        jnp.broadcast_to(g0.opacities[:1], (tv, n_g)),
        (h, w), settings=decoder.cfg.render, margin=1.2,
    )
    print(f"adaptive settings: {render_settings}")

    k_inner = 2

    @jax.jit
    def scenes(params, context, seed):
        def one(i, carry):
            acc, ovf = carry
            ctx = dict(context)
            ctx["image"] = jnp.clip(
                context["image"] + (seed + i).astype(jnp.float32) * 1e-4, 0, 1
            )
            g = encoder.apply(
                params, ctx, jnp.asarray(0), False,
                rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(3), seed + i)},
            )
            out = decoder(
                g, t_extr, t_intr, t_near, t_far, (h, w),
                render_settings=render_settings,
            )
            return acc + out.color[0, :, 0, 0, 0].sum(), ovf + out.overflow

        return jax.lax.fori_loop(0, k_inner, one, (jnp.float32(0), jnp.int32(0)))

    np.asarray(scenes(params, context, jnp.int32(0))[0])
    trace_dir = "/tmp/scene_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        r = scenes(params, context, jnp.int32(1))
        np.asarray(r[0])

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace produced"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    tpu_pids = set()
    op_lanes = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "XLA" not in name.upper():
                tpu_pids.add(e["pid"])
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if e.get("pid") in tpu_pids and e.get("args", {}).get("name") == "XLA Ops":
                op_lanes.add((e["pid"], e.get("tid")))
    by_lane = defaultdict(list)
    longs = {}
    scope_meta = {}
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lanes:
            ts, dur = e.get("ts", 0), e.get("dur", 0)
            name = e.get("name", "?")
            by_lane[(e["pid"], e.get("tid"))].append((ts, ts + dur, dur, name))
            a = e.get("args", {})
            ln = a.get("long_name") or ""
            if ln and name not in longs:
                longs[name] = ln
            tf = a.get("tf_op") or ""
            if tf and name not in scope_meta:
                scope_meta[name] = tf
    by_op = defaultdict(float)
    total = 0.0
    for lane, evs in by_lane.items():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []
        for ts, te, dur, name in evs:
            while stack and stack[-1][0] <= ts:
                end, nm, child, d = stack.pop()
                self_t = max(d - child, 0.0) / 1e3
                by_op[nm] += self_t
                total += self_t
            if stack:
                stack[-1][2] += dur
            stack.append([te, name, 0.0, dur])
        while stack:
            end, nm, child, d = stack.pop()
            self_t = max(d - child, 0.0) / 1e3
            by_op[nm] += self_t
            total += self_t

    print(
        f"scene (encode + {tv}-view render): total device {total:.2f} ms over "
        f"{k_inner} scenes -> {total / k_inner:.2f} ms/scene"
    )
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur/k_inner:7.3f} ms  {name[:58]}  | {longs.get(name, '')[:130]}")

    by_scope = defaultdict(float)
    for name, dur in by_op.items():
        by_scope[_scope_of(scope_meta.get(name, ""))] += dur
    print("\nby scope:")
    for sc, dur in sorted(by_scope.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/k_inner:7.3f} ms  {sc}")


def _scope_of(tf_op: str) -> str:
    if not tf_op:
        return "(no scope)"
    segs = [
        s
        for s in tf_op.split("/")
        if s
        and not s.startswith("jit(")
        and s not in ("while", "body", "cond", "branch_0", "branch_1")
    ]
    depth = 6 if ("epipolar_transformer" in segs or "backbone" in segs) else 3
    if len(segs) > depth:
        segs = segs[:depth]
    return "/".join(segs) or "(top)"


if __name__ == "__main__":
    main()
