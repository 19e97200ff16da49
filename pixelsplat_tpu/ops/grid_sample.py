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
    # The u16 split-half gather only pays off for tables too large for the
    # gather emitter's fast path AND rows that stay <=1 vreg after the
    # split. For feature maps (tiny tables: 64x64x128 f32 = 2 MB) the
    # plain 32-bit row gather is ~7x faster (0.33 vs 2.4 ms per tap at
    # 262k queries, v5e) — the split's 256-lane u16 rows fall off the
    # one-vreg-per-row fast path (1.3 -> 9.9 ns/row).
    use_u16 = (
        flat.dtype.itemsize == 4
        and jax.default_backend() != "cpu"
        and flat.size * flat.dtype.itemsize > 8 * 1024 * 1024
        and c <= 64
    )

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
        idx = yi_c * w + xi_c
        tap = _tap_u16(flat, idx) if use_u16 else flat[idx]  # (..., c)
        term = tap * (wgt * inside)[..., None]
        out = term if out is None else out + term
    return out


@jax.custom_vjp
def _tap_u16(flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather through the u16 split fast path (TPU's gather emitter
    runs ~3x faster on 16-bit rows), with the plain scatter-add backward
    (a sort-based VJP here made the encoder's compile blow up: four taps
    x several vmap levels each dragged their own sort pipeline)."""
    return _tap_u16_fwd(flat, idx)[0]


def _tap_u16_fwd(flat, idx):
    from .rasterizer.tile_gather import fast_gather_rows

    return fast_gather_rows(flat, idx), (idx, flat.shape[0])


def _tap_u16_bwd(residuals, d_out):
    idx, rows = residuals
    d_flat = jnp.zeros((rows, d_out.shape[-1]), d_out.dtype)
    d_flat = d_flat.at[idx.reshape(-1)].add(
        d_out.reshape(-1, d_out.shape[-1])
    )
    return d_flat, None


_tap_u16.defvjp(_tap_u16_fwd, _tap_u16_bwd)


def grid_sample_nhwc_flat(images: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a stack of images (n, h, w, c) at per-image coords
    (n, ..., 2) in [-1, 1] (xy order). Returns (n, ..., c).

    Equivalent to vmap(grid_sample_nhwc) but folds the image index into
    the gather index, so the four taps stay SINGLE-table row gathers of
    one (n*h*w, c) table. XLA's batched gather falls off the TPU gather
    emitter's fast path (measured 1.5 ms vs 0.33 ms per 262k-row tap for
    n=2 64x64x128 feature maps on v5e); the flat form keeps one-vreg
    f32 rows and no batch dimension.
    """
    n, h, w, c = images.shape
    x = ((coords[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    img_base = jnp.arange(n, dtype=jnp.int32) * (h * w)
    img_base = img_base.reshape((n,) + (1,) * (coords.ndim - 2))

    out = None
    flat = images.reshape(n * h * w, c)
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
        idx = img_base + yi_c * w + xi_c
        tap = flat[idx]  # (n, ..., c)
        term = tap * (wgt * inside)[..., None]
        out = term if out is None else out + term
    return out


def grid_sample_batched(images: jax.Array, coords: jax.Array) -> jax.Array:
    """vmap of grid_sample over a leading batch axis.

    images: (b, c, h, w); coords: (b, ..., 2) → (b, ..., c).
    """
    return jax.vmap(grid_sample)(images, coords)
