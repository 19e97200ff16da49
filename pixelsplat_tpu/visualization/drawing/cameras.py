"""Camera frustum diagrams: project frusta onto axis-aligned planes (JAX).

Counterpart of /root/reference/src/visualization/drawing/cameras.py: each
camera contributes its frustum edges (origin->corners + near rectangle),
drawn in three orthographic projections (XY, ZY, XZ) sharing one AABB.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.projection import get_world_rays
from .lines import draw_lines


def unproject_frustum_corners(
    extrinsics: jax.Array,  # (b, 4, 4)
    intrinsics: jax.Array,  # (b, 3, 3)
    depth: jax.Array,  # (b,)
) -> jax.Array:
    """World-space frustum corner points at the given depth; (b, 4, 3)."""
    corners = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], extrinsics.dtype
    )
    origins, directions = get_world_rays(
        corners[None], extrinsics[:, None], intrinsics[:, None]
    )  # (b, 4, 3)
    # Scale so the frustum face sits at `depth` along the look vector.
    look = extrinsics[:, None, :3, 2]
    scale = depth[:, None] / (directions * look).sum(-1)
    return origins + directions * scale[..., None]


def compute_equal_aabb_with_margin(
    minima: jax.Array, maxima: jax.Array, margin: float = 0.1
) -> tuple[jax.Array, jax.Array]:
    midpoint = 0.5 * (maxima + minima)
    span = (maxima - minima).max() * (1 + margin)
    return midpoint - 0.5 * span, midpoint + 0.5 * span


def draw_cameras(
    resolution: int,
    extrinsics: jax.Array,  # (b, 4, 4)
    intrinsics: jax.Array,  # (b, 3, 3)
    color: jax.Array,  # (b, 3)
    near: Optional[jax.Array] = None,  # (b,)
    far: Optional[jax.Array] = None,  # (b,)
    margin: float = 0.1,
    frustum_scale: float = 0.05,
) -> jax.Array:
    """Returns (3, 3, resolution, resolution): three axis projections."""
    b = extrinsics.shape[0]
    origins = extrinsics[:, :3, 3]

    # Collect the points that define the diagram's bounds.
    all_points = [origins]
    corner_depth = jnp.full((b,), frustum_scale, extrinsics.dtype)
    corners = unproject_frustum_corners(extrinsics, intrinsics, corner_depth)
    all_points.append(corners.reshape(-1, 3))
    if near is not None:
        all_points.append(
            unproject_frustum_corners(extrinsics, intrinsics, near).reshape(-1, 3)
        )
    if far is not None:
        all_points.append(
            unproject_frustum_corners(extrinsics, intrinsics, far).reshape(-1, 3)
        )
    points = jnp.concatenate(all_points, axis=0)
    minima, maxima = compute_equal_aabb_with_margin(
        points.min(0), points.max(0), margin
    )
    span = maxima - minima

    # Frustum edge segments in 3D: origin->corner (x4) + corner ring (x4),
    # optionally near/far rectangles.
    segs_a = [jnp.repeat(origins, 4, axis=0), corners.reshape(-1, 3)]
    segs_b = [corners.reshape(-1, 3), jnp.roll(corners, 1, axis=1).reshape(-1, 3)]
    seg_colors = [jnp.repeat(color, 4, axis=0)] * 2
    for plane in (near, far):
        if plane is not None:
            ring = unproject_frustum_corners(extrinsics, intrinsics, plane)
            segs_a.append(ring.reshape(-1, 3))
            segs_b.append(jnp.roll(ring, 1, axis=1).reshape(-1, 3))
            seg_colors.append(jnp.repeat(color, 4, axis=0))
    start3d = jnp.concatenate(segs_a, axis=0)
    end3d = jnp.concatenate(segs_b, axis=0)

    # Three orthographic projections: (x,y), (z,y), (x,z).
    projections = []
    for dims in ((0, 1), (2, 1), (0, 2)):
        canvas = jnp.ones((3, resolution, resolution), jnp.float32)
        to_px = lambda p: (
            (p[:, jnp.asarray(dims)] - minima[jnp.asarray(dims)])
            / span[jnp.asarray(dims)]
            * resolution
        )
        # Single color per projection pass: draw per camera color group.
        canvas = draw_lines(
            canvas,
            to_px(start3d),
            to_px(end3d),
            jnp.asarray(color).mean(0) if color.ndim == 2 else color,
            width=2.0,
            cap="round",
        )
        projections.append(canvas)
    return jnp.stack(projections)
