"""Validation-time 3D views: orthographic Gaussian projections + cameras.

Mirrors /root/reference/src/visualization/validation_in_3d.py:
`render_projections` renders the Gaussian set from top/front/side
orthographic cameras via the splatting renderer;
`render_cameras` draws the batch's camera frusta with the line rasterizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.types import Gaussians
from ..ops.rasterizer import RenderSettings, render_orthographic
from .drawing.cameras import compute_equal_aabb_with_margin, draw_cameras


def render_projections(
    gaussians: Gaussians,
    resolution: int,
    margin: float = 0.1,
    settings: RenderSettings = RenderSettings(capacity=2048, big_capacity=128),
) -> jax.Array:
    """(b, 3, 3, resolution, resolution): XY / ZY / XZ orthographic views."""
    b = gaussians.means.shape[0]
    minima = gaussians.means.min(axis=1)
    maxima = gaussians.means.max(axis=1)
    minima, maxima = jax.vmap(
        lambda mn, mx: compute_equal_aabb_with_margin(mn, mx, margin)
    )(minima, maxima)
    span = (maxima - minima).max(-1)

    projections = []
    # Look along +z (XY), +x (ZY), -y (XZ): build c2w extrinsics outside
    # the scene looking at its center.
    for axis in range(3):
        extrinsics = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        center = np.asarray(0.5 * (minima + maxima))
        offset = np.zeros((b, 3), np.float32)
        if axis == 0:  # look along +z
            rot = np.eye(3, dtype=np.float32)
            offset[:, 2] = -np.asarray(span)
        elif axis == 1:  # look along +x
            rot = np.asarray(
                [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32
            ).T
            offset[:, 0] = -np.asarray(span)
        else:  # look along +y
            rot = np.asarray(
                [[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32
            ).T
            offset[:, 1] = -np.asarray(span)
        extrinsics[:, :3, :3] = rot
        extrinsics[:, :3, 3] = center + offset

        width = jnp.asarray(maxima - minima).max(-1) * (1 + margin)
        img = render_orthographic(
            jnp.asarray(extrinsics),
            width,
            width,
            jnp.zeros(b),
            2.0 * jnp.asarray(span),
            (resolution, resolution),
            jnp.zeros((b, 3)),
            gaussians.means,
            gaussians.covariances,
            gaussians.harmonics,
            gaussians.opacities,
            settings=settings,
        )
        projections.append(img)
    return jnp.stack(projections, axis=1)


def render_cameras(batch: dict, resolution: int) -> jax.Array:
    """Draw context + target camera frusta (first batch element)."""
    context = batch["context"]
    target = batch["target"]
    cv = context["extrinsics"].shape[1]
    tv = target["extrinsics"].shape[1]
    extrinsics = jnp.concatenate(
        [context["extrinsics"][0], target["extrinsics"][0]], axis=0
    )
    intrinsics = jnp.concatenate(
        [context["intrinsics"][0], target["intrinsics"][0]], axis=0
    )
    color = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray([0.2, 0.6, 1.0]), (cv, 3)),
            jnp.broadcast_to(jnp.asarray([1.0, 0.3, 0.2]), (tv, 3)),
        ],
        axis=0,
    )
    near = jnp.concatenate([context["near"][0], target["near"][0]])
    far = jnp.concatenate([context["far"][0], target["far"][0]])
    return draw_cameras(resolution, extrinsics, intrinsics, color, near, far)
