"""Input sanitizers for the drawing primitives.

Counterpart of /root/reference/src/visualization/drawing/types.py: accept
scalars / tuples / arrays for vector and scalar primitive arguments and
normalize them to batched arrays.
"""

from __future__ import annotations

from typing import Iterable, Union

import jax
import jax.numpy as jnp

Vector = Union[tuple[float, float], jax.Array, Iterable[float]]
Scalar = Union[float, int, jax.Array]
Color = Union[float, Iterable[float], jax.Array]


def sanitize_vector(vector: Vector, dimensions: int = 2) -> jax.Array:
    """-> (batch, dimensions) float array."""
    v = jnp.asarray(vector, jnp.float32)
    if v.ndim == 1:
        v = v[None]
    assert v.shape[-1] == dimensions
    return v


def sanitize_scalar(scalar: Scalar, batch: int = 1) -> jax.Array:
    """-> (batch,) float array."""
    s = jnp.asarray(scalar, jnp.float32)
    if s.ndim == 0:
        s = jnp.broadcast_to(s, (batch,))
    return s


def sanitize_color(color: Color) -> jax.Array:
    """-> (3,) float array (grey from scalars)."""
    c = jnp.asarray(color, jnp.float32)
    if c.ndim == 0:
        c = jnp.broadcast_to(c, (3,))
    return c
