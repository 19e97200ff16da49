"""Bilinear grid sampling (torch F.grid_sample semantics) in pure JAX.

Matches `mode="bilinear", padding_mode="zeros", align_corners=False`, which
is what the reference epipolar sampler uses
(/root/reference/src/model/encoder/epipolar/epipolar_sampler.py:98-104).
Implemented as four gathers plus a lerp — XLA fuses the weight computation
and the gathers vectorize over all query points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(image: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample `image` (c, h, w) at `coords` (..., 2) in [-1, 1] (xy order).

    Returns (..., c). Out-of-bounds taps contribute zero.
    """
    c, h, w = image.shape
    # align_corners=False: pixel i covers [i-0.5, i+0.5] in index space.
    x = ((coords[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    out = None
    flat = image.reshape(c, h * w)
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        tap = flat[:, yi_c * w + xi_c]  # (c, ...)
        tap = jnp.moveaxis(tap, 0, -1)  # (..., c)
        term = tap * (wgt * inside)[..., None]
        out = term if out is None else out + term
    return out


def grid_sample_nhwc(image: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample `image` (h, w, c) at `coords` (..., 2) in [-1, 1] (xy order).

    Channels-last variant: the four taps become row gathers of c-wide rows
    (c rides the TPU lane dimension), unlike the (c, h, w) form whose
    gather runs along the minor axis. Returns (..., c); out-of-bounds taps
    contribute zero.
    """
    h, w, c = image.shape
    x = ((coords[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    out = None
    flat = image.reshape(h * w, c)
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        tap = flat[yi_c * w + xi_c]  # (..., c) row gather
        term = tap * (wgt * inside)[..., None]
        out = term if out is None else out + term
    return out


def grid_sample_batched(images: jax.Array, coords: jax.Array) -> jax.Array:
    """vmap of grid_sample over a leading batch axis.

    images: (b, c, h, w); coords: (b, ..., 2) → (b, ..., c).
    """
    return jax.vmap(grid_sample)(images, coords)
