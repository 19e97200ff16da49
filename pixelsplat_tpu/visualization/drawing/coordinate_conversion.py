"""World <-> pixel coordinate converters for drawing overlays.

Counterpart of /root/reference/src/visualization/drawing/coordinate_conversion.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PixelSpace(NamedTuple):
    """Maps normalized image coordinates to pixel coordinates and back."""

    to_pixel: Callable[[jax.Array], jax.Array]
    from_pixel: Callable[[jax.Array], jax.Array]


def generate_conversions(
    image_shape: tuple[int, int],
) -> PixelSpace:
    h, w = image_shape
    scale = jnp.asarray([w, h], jnp.float32)

    def to_pixel(xy: jax.Array) -> jax.Array:
        return xy * scale

    def from_pixel(xy: jax.Array) -> jax.Array:
        return xy / scale

    return PixelSpace(to_pixel=to_pixel, from_pixel=from_pixel)
