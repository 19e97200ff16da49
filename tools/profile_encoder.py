"""Device-timeline profile of the production encoder forward (test protocol).

Traces the probabilistic (gpp=3) encoder on the bench.py scene with
jax.profiler, parses the perfetto JSON, and prints per-op device time for
the TPU track aggregated by op name — the map for encoder optimization
(the epipolar transformer + backbone are the headline-scene hot path).

Usage: python tools/profile_encoder.py [--grad] [--deterministic]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
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
    from pixelsplat_tpu.model.encoder import get_encoder

    grad = "--grad" in sys.argv
    deterministic = "--deterministic" in sys.argv
    cfg = load_config(["+experiment=re10k"])
    encoder, _ = get_encoder(cfg.model.encoder)

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
    params = jax.jit(
        lambda r, c: encoder.init(r, c, jnp.asarray(0), False)
    )({"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}, context)

    n_inner = 4

    def encode_sum(params, context, seed):
        def one(i, acc):
            ctx = dict(context)
            ctx["image"] = jnp.clip(
                context["image"] + (seed + i).astype(jnp.float32) * 1e-4, 0, 1
            )
            g = encoder.apply(
                params,
                ctx,
                jnp.asarray(0),
                deterministic,
                rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(3), i)},
            )
            return (
                acc
                + g.means.sum()
                + g.opacities.sum()
                + g.harmonics[..., 0].sum()
            )

        return jax.lax.fori_loop(0, n_inner, one, jnp.float32(0))

    if grad:
        fn = jax.jit(jax.grad(encode_sum))
        sync = lambda r: np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    else:
        fn = jax.jit(encode_sum)
        sync = lambda r: np.asarray(r)

    sync(fn(params, context, jnp.int32(0)))  # compile
    trace_dir = "/tmp/encoder_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        r = fn(params, context, jnp.int32(1))
        sync(r)

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
    longs = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = e.get("dur", 0) / 1e3
            name = e.get("name", "?")
            by_op[name] += dur
            total += dur
            a = e.get("args", {})
            ln = a.get("long_name") or a.get("tf_op") or ""
            if ln and name not in longs:
                longs[name] = ln
    mode = "fwd+bwd" if grad else "fwd"
    kind = "deterministic" if deterministic else "probabilistic gpp=3"
    print(
        f"encoder {mode} ({kind}): total device {total:.2f} ms over "
        f"{n_inner} encodes -> {total/n_inner:.2f} ms/encode"
    )
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/n_inner:7.3f} ms  {name[:58]}  | {longs.get(name, '')[:120]}")


if __name__ == "__main__":
    main()
