"""Discrete distribution sampling (inverse CDF / top-k).

Mirrors /root/reference/src/misc/discrete_probability_distribution.py with
explicit PRNG keys instead of global torch RNG state.

TPU note: bucket counts here are tiny (32 in the shipped configs), so
inverse-CDF indices come from a vectorized comparison count and values are
read back with a one-hot contraction. The obvious `searchsorted` +
`take_along_axis` formulation lowers to a binary-search while-loop plus
row gathers, which cost ~66 ms per encoder forward at production scale —
three orders of magnitude more than the arithmetic it replaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = float(jnp.finfo(jnp.float32).eps)


def onehot_gather(values: jax.Array, index: jax.Array) -> jax.Array:
    """values: (*batch, bucket); index: (*batch, sample) -> (*batch, sample).

    Equivalent to take_along_axis on the last axis, as a fused
    compare-multiply-reduce (no gather on the TPU lane dimension).
    """
    bucket = values.shape[-1]
    onehot = index[..., None] == jnp.arange(bucket, dtype=index.dtype)
    return jnp.sum(
        jnp.where(onehot, values[..., None, :], 0), axis=-1
    ).astype(values.dtype)


def sample_discrete_distribution(
    key: jax.Array,
    pdf: jax.Array,  # (*batch, bucket)
    num_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """Inverse-CDF sampling. Returns (indices, densities), (*batch, sample)."""
    *batch, bucket = pdf.shape
    normalized = pdf / (_EPS + pdf.sum(axis=-1, keepdims=True))
    cdf = jnp.cumsum(normalized, axis=-1)
    u = jax.random.uniform(key, (*batch, num_samples), dtype=pdf.dtype)
    # index = #{j : cdf[j] <= u} == searchsorted(cdf, u, side="right"),
    # computed as a comparison count (bucket is small).
    index = jnp.sum(
        (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
    )
    index = jnp.clip(index, 0, bucket - 1)
    density = onehot_gather(normalized, index)
    return index, density


def gather_discrete_topk(
    pdf: jax.Array,
    num_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """Deterministic top-k. Returns (indices, densities), (*batch, sample).

    Iterated masked argmax: lax.top_k lowers to a slow negate-reduce on
    TPU, while num_samples is small (<= gaussians_per_pixel).
    """
    bucket = pdf.shape[-1]
    normalized = pdf / (_EPS + pdf.sum(axis=-1, keepdims=True))
    positions = jnp.arange(bucket, dtype=jnp.int32)
    work = pdf
    indices = []
    for _ in range(num_samples):
        best = jnp.argmax(work, axis=-1).astype(jnp.int32)
        indices.append(best)
        work = jnp.where(positions == best[..., None], -jnp.inf, work)
    index = jnp.stack(indices, axis=-1)
    density = onehot_gather(normalized, index)
    return index, density
