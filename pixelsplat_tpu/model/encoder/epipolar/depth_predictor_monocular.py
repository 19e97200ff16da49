"""Monocular depth predictor: depth-bucket pdf + intra-bucket offsets.

Mirrors /root/reference/src/model/encoder/epipolar/depth_predictor_monocular.py:
per-pixel features produce a categorical distribution over `num_samples`
disparity buckets plus a sigmoid offset within each bucket; depths are
sampled stochastically during training (inverse-CDF with explicit PRNG
keys) or top-k when deterministic. Opacity is the sampled pdf value,
optionally transmittance-corrected pdf / (1 - cdf).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....utils.distributions import (
    gather_discrete_topk,
    onehot_gather,
    sample_discrete_distribution,
)
from .conversions import relative_disparity_to_depth


class DepthPredictorMonocular(nn.Module):
    d_in: int
    num_samples: int
    num_surfaces: int
    use_transmittance: bool

    @nn.compact
    def __call__(
        self,
        features: jax.Array,  # (b, v, ray, channel)
        near: jax.Array,  # (b, v)
        far: jax.Array,  # (b, v)
        deterministic: bool,
        gaussians_per_pixel: int,
        rng: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (depths, densities), each (b, v, ray, surface, sample)."""
        s = self.num_samples
        srf = self.num_surfaces

        x = nn.relu(features)
        x = nn.Dense(2 * s * srf, name="projection")(x)
        # Split layout matches the reference einops pattern
        # "... (dpt srf c) -> c ... srf dpt" (c fastest-varying).
        x = x.reshape(*x.shape[:-1], s, srf, 2)
        pdf_raw = x[..., 0].swapaxes(-1, -2)  # (b, v, r, srf, dpt)
        offset_raw = x[..., 1].swapaxes(-1, -2)
        pdf = jax.nn.softmax(pdf_raw, axis=-1)
        offset = jax.nn.sigmoid(offset_raw)
        # Figure tooling reads the full distribution (reference grabs it
        # with forward hooks on to_pdf/to_offset,
        # src/paper/generate_sampling_figure.py:100-110); free unless
        # apply() requests the `intermediates` collection.
        self.sow("intermediates", "pdf", pdf)
        self.sow("intermediates", "offset", offset)

        if deterministic:
            index, pdf_i = gather_discrete_topk(pdf, gaussians_per_pixel)
        else:
            if rng is None:
                rng = self.make_rng("sample")
            index, pdf_i = sample_discrete_distribution(rng, pdf, gaussians_per_pixel)
        offset_i = onehot_gather(offset, index)  # take_along_axis lowers to
        # a slow row gather on TPU; bucket count is tiny.

        relative_disparity = (index.astype(offset.dtype) + offset_i) / s
        depth = relative_disparity_to_depth(
            relative_disparity,
            near[:, :, None, None, None],
            far[:, :, None, None, None],
        )

        if self.use_transmittance:
            partial = jnp.cumsum(pdf, axis=-1)
            partial = jnp.concatenate(
                [jnp.zeros_like(partial[..., :1]), partial[..., :-1]], axis=-1
            )
            opacity = pdf / (1.0 - partial + 1e-10)
            opacity = onehot_gather(opacity, index)
        else:
            opacity = pdf_i

        return depth, opacity
