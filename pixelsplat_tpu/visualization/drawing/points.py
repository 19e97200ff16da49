"""Antialiased points / rings (JAX).

Counterpart of /root/reference/src/visualization/drawing/points.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rendering import (
    render_colored_primitives_over_image,
    render_primitives_over_image,
)


def draw_points(
    image: jax.Array,  # (3, h, w)
    points: jax.Array,  # (n, 2) pixel coordinates (xy)
    color,
    radius: float,
    inner_radius: float = 0.0,
) -> jax.Array:
    """Filled discs, or rings when inner_radius > 0."""
    points = jnp.asarray(points, jnp.float32)

    def per_point(coords):  # (h, w, 2) -> (h, w, n)
        d = jnp.linalg.norm(coords[:, :, None, :] - points[None, None], axis=-1)
        if inner_radius > 0:
            # Ring: distance from the annulus.
            mid = 0.5 * (radius + inner_radius)
            half = 0.5 * (radius - inner_radius)
            return jnp.abs(d - mid) - half
        return d - radius

    color = jnp.asarray(color, jnp.float32)
    if color.ndim == 2:  # per-point colors
        return render_colored_primitives_over_image(
            jnp.asarray(image), per_point, color
        )

    return render_primitives_over_image(
        jnp.asarray(image), lambda c: per_point(c).min(axis=-1), color
    )
