"""Discrete distribution sampling (inverse CDF / top-k).

Mirrors /root/reference/src/misc/discrete_probability_distribution.py with
explicit PRNG keys instead of global torch RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = float(jnp.finfo(jnp.float32).eps)


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
    # searchsorted(right) per batch row.
    index = jax.vmap(lambda c, s: jnp.searchsorted(c, s, side="right"))(
        cdf.reshape(-1, bucket), u.reshape(-1, num_samples)
    ).reshape(*batch, num_samples)
    index = jnp.clip(index, 0, bucket - 1)
    density = jnp.take_along_axis(normalized, index, axis=-1)
    return index, density


def gather_discrete_topk(
    pdf: jax.Array,
    num_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """Deterministic top-k. Returns (indices, densities), (*batch, sample)."""
    normalized = pdf / (_EPS + pdf.sum(axis=-1, keepdims=True))
    _, index = jax.lax.top_k(pdf, num_samples)
    density = jnp.take_along_axis(normalized, index, axis=-1)
    return index, density
