"""Microbench of the backbone pyramid resize-and-sum variants on TPU.

The production pyramid (resnet50, 256^2, d_out=512, 2 views) measured
~6.9 ms inside the encoder (concat relayouts + 6-pass f32 HIGHEST dot).
This compares: (a) current fused f32 HIGHEST, (b) bf16 inputs / f32
accumulate, (c) per-stage bf16 dots accumulated, and reports max rel
error vs an f64-free f32 reference.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.model.encoder.backbone.resnet import (
    _bilinear_resize,
    _resize_and_sum,
    _resize_matrix,
)

B, C = 2, 512
SHAPES = [(128, 128), (128, 128), (64, 64), (32, 32), (16, 16)]
OUT = (256, 256)


def make_features(key):
    feats = []
    for i, (h, w) in enumerate(SHAPES):
        key, k = jax.random.split(key)
        feats.append(jax.random.normal(k, (B, h, w, C), jnp.float32))
    return feats


def variant_current(feats):
    return _resize_and_sum(feats, OUT)


def variant_bf16_fused(feats):
    prec = jax.lax.Precision.DEFAULT
    cols, mats = [], []
    for f in feats:
        _, h, w, _ = f.shape
        y = f.astype(jnp.bfloat16)
        if h != OUT[0]:
            mh = jnp.asarray(_resize_matrix(h, OUT[0])).astype(jnp.bfloat16)
            y = jnp.einsum(
                "oh,bhwc->bowc", mh, y, precision=prec,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        cols.append(y)
        mats.append(_resize_matrix(w, OUT[1]))
    xcat = jnp.concatenate(cols, axis=2)
    mcat = jnp.asarray(np.concatenate(mats, axis=1)).astype(jnp.bfloat16)
    return jnp.einsum(
        "ow,bhwc->bhoc", mcat, xcat, precision=prec,
        preferred_element_type=jnp.float32,
    )


def variant_bf16_perstage(feats):
    prec = jax.lax.Precision.DEFAULT
    acc = None
    for f in feats:
        _, h, w, _ = f.shape
        y = f.astype(jnp.bfloat16)
        if h != OUT[0]:
            mh = jnp.asarray(_resize_matrix(h, OUT[0])).astype(jnp.bfloat16)
            y = jnp.einsum(
                "oh,bhwc->bowc", mh, y, precision=prec,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        mw = jnp.asarray(_resize_matrix(w, OUT[1])).astype(jnp.bfloat16)
        z = jnp.einsum(
            "ow,bhwc->bhoc", mw, y, precision=prec,
            preferred_element_type=jnp.float32,
        )
        acc = z if acc is None else acc + z
    return acc


def variant_default_fused(feats):
    # f32 storage, Precision.DEFAULT dots: TPU lowers to one-pass bf16
    # MXU matmuls with f32 accumulate; CPU stays exact f32 (golden tests
    # unaffected).
    prec = jax.lax.Precision.DEFAULT
    cols, mats = [], []
    for f in feats:
        _, h, w, _ = f.shape
        y = f
        if h != OUT[0]:
            mh = jnp.asarray(_resize_matrix(h, OUT[0]))
            y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=prec)
        cols.append(y)
        mats.append(_resize_matrix(w, OUT[1]))
    xcat = jnp.concatenate(cols, axis=2)
    mcat = jnp.asarray(np.concatenate(mats, axis=1))
    return jnp.einsum("ow,bhwc->bhoc", mcat, xcat, precision=prec)


def variant_f32_perstage(feats):
    acc = None
    for f in feats:
        z = _bilinear_resize(f, OUT)
        acc = z if acc is None else acc + z
    return acc


def timeit(fn, feats, n=20):
    # NOTE: jax.block_until_ready is a no-op on the axon tunnel backend;
    # a tiny slice fetch is the only true sync (see tools/profile_*.py).
    jitted = jax.jit(fn)
    sync = lambda o: np.asarray(o[0, 0, 0, :1])
    out = jitted(feats)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jitted(feats)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    feats = make_features(jax.random.PRNGKey(0))
    ref = jax.jit(variant_f32_perstage)(feats)
    err_fn = jax.jit(
        lambda a, b: (jnp.abs(a.astype(jnp.float32) - b).max(), jnp.abs(b).max())
    )
    for name, fn in [
        ("f32 fused (current)", variant_current),
        ("f32 per-stage", variant_f32_perstage),
        ("bf16 fused", variant_bf16_fused),
        ("default fused", variant_default_fused),
        ("bf16 per-stage", variant_bf16_perstage),
    ]:
        ms, out = timeit(fn, feats)
        e, s = err_fn(out, ref)
        err = float(np.asarray(e)) / float(np.asarray(s))
        print(f"{name:22s} {ms:7.3f} ms   max rel err {err:.2e}")


if __name__ == "__main__":
    main()
