"""Antialiased line segments (JAX).

Counterpart of /root/reference/src/visualization/drawing/lines.py
(butt/round/square caps) via signed distance to each segment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rendering import (
    render_colored_primitives_over_image,
    render_primitives_over_image,
)


def _segment_distance(
    coords: jax.Array,  # (h, w, 2)
    start: jax.Array,  # (n, 2)
    end: jax.Array,  # (n, 2)
    cap: str,
) -> jax.Array:
    """Min distance from each pixel to any of the segments; (h, w)."""
    p = coords[:, :, None, :]  # (h, w, 1, 2)
    a = start[None, None]  # (1, 1, n, 2)
    b = end[None, None]
    ab = b - a
    denom = (ab * ab).sum(-1) + 1e-12
    t = ((p - a) * ab).sum(-1) / denom
    if cap == "butt":
        t_clamped = jnp.clip(t, 0.0, 1.0)
        closest = a + t_clamped[..., None] * ab
        d = jnp.linalg.norm(p - closest, axis=-1)
    elif cap == "round":
        t_clamped = jnp.clip(t, 0.0, 1.0)
        closest = a + t_clamped[..., None] * ab
        d = jnp.linalg.norm(p - closest, axis=-1)
    elif cap == "square":
        # Extend by half a width along the line; approximated by extending t.
        length = jnp.sqrt(denom)
        ext = 0.5 / length
        t_clamped = jnp.clip(t, -ext, 1.0 + ext)
        closest = a + t_clamped[..., None] * ab
        d = jnp.linalg.norm(p - closest, axis=-1)
    else:
        raise ValueError(f"unknown cap {cap!r}")
    return d


def draw_lines(
    image: jax.Array,  # (3, h, w)
    start: jax.Array,  # (n, 2) pixel coordinates (xy)
    end: jax.Array,  # (n, 2)
    color,
    width: float,
    cap: str = "round",
) -> jax.Array:
    start = jnp.asarray(start, jnp.float32)
    end = jnp.asarray(end, jnp.float32)

    color = jnp.asarray(color, jnp.float32)
    if color.ndim == 2:  # per-segment colors
        def distances(coords):
            return _segment_distance(coords, start, end, cap) - width / 2.0

        return render_colored_primitives_over_image(
            jnp.asarray(image), distances, color
        )

    def distance(coords):
        return (_segment_distance(coords, start, end, cap) - width / 2.0).min(
            axis=-1
        )

    return render_primitives_over_image(jnp.asarray(image), distance, color)
