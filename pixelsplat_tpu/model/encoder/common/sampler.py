"""Generalized discrete-pdf sampler (bucket sampling + broadcast gather).

Counterpart of /root/reference/src/model/encoder/common/sampler.py:10-42 —
the generalized variant of the monocular depth predictor's sampler; not on
the main epipolar path but part of the public encoder API. Functional (no
parameters): pass an explicit RNG key instead of relying on module state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ....utils.distributions import (
    gather_discrete_topk,
    sample_discrete_distribution,
)


def sample(
    probabilities: jax.Array,  # (*batch, bucket)
    num_samples: int,
    deterministic: bool,
    key: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (index, density), each (*batch, num_samples)."""
    if deterministic:
        return gather_discrete_topk(probabilities, num_samples)
    if key is None:
        raise ValueError("stochastic sampling requires an RNG key")
    return sample_discrete_distribution(key, probabilities, num_samples)


def gather(index: jax.Array, target: jax.Array) -> jax.Array:
    """Gather along the bucket axis with trailing broadcast dims.

    index: (*batch, sample); target: (*batch, bucket, *shape) →
    (*batch, sample, *shape).
    """
    batch_ndim = index.ndim - 1
    trailing = target.ndim - batch_ndim - 1
    idx = index.reshape(index.shape + (1,) * trailing)
    idx = jnp.broadcast_to(idx, index.shape + target.shape[batch_ndim + 1 :])
    return jnp.take_along_axis(target, idx, axis=batch_ndim)
