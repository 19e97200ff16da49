"""Generalized pdf-input depth predictor + sampler.

Counterparts of /root/reference/src/model/encoder/common/depth_predictor.py
and common/sampler.py — variants that consume an externally provided pdf
(the main path uses DepthPredictorMonocular instead; these are kept for
capability parity with the reference inventory).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....utils.distributions import (
    gather_discrete_topk,
    sample_discrete_distribution,
)
from ..epipolar.conversions import relative_disparity_to_depth


class Sampler:
    """Sample bucket indices from a pdf; deterministic → top-k."""

    def __call__(
        self,
        pdf: jax.Array,  # (*batch, bucket)
        num_samples: int,
        deterministic: bool,
        rng: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        if deterministic:
            return gather_discrete_topk(pdf, num_samples)
        assert rng is not None
        return sample_discrete_distribution(rng, pdf, num_samples)

    def gather(self, index: jax.Array, target: jax.Array) -> jax.Array:
        return jnp.take_along_axis(target, index, axis=-1)


class DepthPredictor(nn.Module):
    """pdf (+ learned offsets) → depths and opacities."""

    num_samples: int
    use_transmittance: bool = False

    @nn.compact
    def __call__(
        self,
        pdf: jax.Array,  # (*batch, bucket)
        near: jax.Array,  # (*batch,)
        far: jax.Array,  # (*batch,)
        deterministic: bool,
        gaussians_per_pixel: int,
        rng: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        sampler = Sampler()
        index, pdf_i = sampler(pdf, gaussians_per_pixel, deterministic, rng)
        buckets = pdf.shape[-1]
        offset = jnp.full(index.shape, 0.5, pdf.dtype)
        relative_disparity = (index.astype(pdf.dtype) + offset) / buckets
        depth = relative_disparity_to_depth(
            relative_disparity, near[..., None], far[..., None]
        )
        if self.use_transmittance:
            partial = jnp.cumsum(pdf, axis=-1)
            partial = jnp.concatenate(
                [jnp.zeros_like(partial[..., :1]), partial[..., :-1]], axis=-1
            )
            opacity = pdf / (1.0 - partial + 1e-10)
            opacity = jnp.take_along_axis(opacity, index, axis=-1)
        else:
            opacity = pdf_i
        return depth, opacity
