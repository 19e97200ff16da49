"""Epipolar sampling: per-ray feature samples along other views' epipolar lines.

Functional counterpart of the reference EpipolarSampler
(/root/reference/src/model/encoder/epipolar/epipolar_sampler.py). It has no
learnable parameters, so it's a pure function here. The reference's
"heterogeneous transpose" trick (transpose → grid_sample over a merged
(b v) axis → transpose back) is replaced by gathering each (view,
other_view) pair's source image directly — same result, one gather instead
of two index shuffles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....geometry.epipolar_lines import project_rays
from ....geometry.projection import get_world_rays, sample_image_grid
from ....ops.grid_sample import grid_sample_nhwc_flat
from ....utils.pairings import generate_heterogeneous_index


class EpipolarSampling(NamedTuple):
    features: jax.Array  # (b, v, ov, ray, sample, channel)
    valid: jax.Array  # (b, v, ov, ray)
    xy_ray: jax.Array  # (b, v, ray, 2)
    xy_sample: jax.Array  # (b, v, ov, ray, sample, 2)
    xy_sample_near: jax.Array  # (b, v, ov, ray, sample, 2)
    xy_sample_far: jax.Array  # (b, v, ov, ray, sample, 2)
    origins: jax.Array  # (b, v, ray, 3)
    directions: jax.Array  # (b, v, ray, 3)


def _collect_other_views(target: jax.Array, v: int) -> jax.Array:
    """(b, v, ...) -> (b, v, v-1, ...) selecting, per view, all other views."""
    _, index_other = generate_heterogeneous_index(v)
    return target[:, jnp.asarray(index_other)]


def sample_along_epipolar_lines(
    images: jax.Array,  # (b, v, h, w, c) feature maps (channels-last)
    extrinsics: jax.Array,  # (b, v, 4, 4)
    intrinsics: jax.Array,  # (b, v, 3, 3)
    near: jax.Array,  # (b, v)
    far: jax.Array,  # (b, v)
    num_samples: int,
) -> EpipolarSampling:
    b, v, h, w, _ = images.shape
    s = num_samples

    # Rays through every feature-grid pixel of every view.
    xy, _ = sample_image_grid((h, w), dtype=images.dtype)
    xy = xy.reshape(h * w, 2)
    origins, directions = get_world_rays(
        xy, extrinsics[:, :, None], intrinsics[:, :, None]
    )  # (b, v, r, 3)

    other_extrinsics = _collect_other_views(extrinsics, v)  # (b, v, ov, 4, 4)
    other_intrinsics = _collect_other_views(intrinsics, v)

    projection = project_rays(
        origins[:, :, None],  # (b, v, 1, r, 3)
        directions[:, :, None],
        other_extrinsics[:, :, :, None],  # (b, v, ov, 1, 4, 4)
        other_intrinsics[:, :, :, None],
        near=near[:, :, None, None],
        far=far[:, :, None, None],
    )

    # Evenly spaced samples along each visible segment.
    sample_depth = (jnp.arange(s, dtype=images.dtype) + 0.5) / s
    sample_depth = sample_depth[:, None]  # (s, 1)
    overlap = projection.overlaps_image[..., None]  # (b, v, ov, r, 1)
    xy_min = jnp.nan_to_num(projection.xy_min, posinf=0.0, neginf=0.0) * overlap
    xy_max = jnp.nan_to_num(projection.xy_max, posinf=0.0, neginf=0.0) * overlap
    xy_min = xy_min[..., None, :]  # (b, v, ov, r, 1, 2)
    xy_max = xy_max[..., None, :]
    xy_sample = xy_min + sample_depth * (xy_max - xy_min)

    # Sample features from the view each epipolar line lives in.
    _, index_other = generate_heterogeneous_index(v)
    source_images = images[:, jnp.asarray(index_other)]  # (b, v, ov, h, w, c)
    coords = 2.0 * xy_sample - 1.0  # (b, v, ov, r, s, 2)
    c = images.shape[-1]
    features = grid_sample_nhwc_flat(
        source_images.reshape(b * v * (v - 1), h, w, c),
        coords.reshape(b * v * (v - 1), -1, s, 2),
    ).reshape(*coords.shape[:-1], c)  # (b, v, ov, r, s, c)

    # Zero out rays that don't overlap the other view at all.
    features = features * overlap[..., None]

    half_span = 0.5 / s
    return EpipolarSampling(
        features=features,
        valid=projection.overlaps_image,
        xy_ray=jnp.broadcast_to(xy, (b, v, h * w, 2)),
        xy_sample=xy_sample,
        xy_sample_near=xy_min + (sample_depth - half_span) * (xy_max - xy_min),
        xy_sample_far=xy_min + (sample_depth + half_span) * (xy_max - xy_min),
        origins=origins,
        directions=directions,
    )
