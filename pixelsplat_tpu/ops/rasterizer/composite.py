"""Front-to-back alpha compositing of binned Gaussians, in pure JAX.

Replaces the per-tile compositing loop of the CUDA rasterizer. The depth
axis is processed in chunks under `lax.scan` carrying per-pixel
(transmittance, accumulated color); within a chunk the exclusive
transmittance product is a `cumprod` and the color accumulation is a small
batched matmul (pixels x chunk) @ (chunk x 3) that XLA places on the MXU.
`jax.checkpoint` on the chunk body keeps backward memory flat (alphas are
recomputed in the backward sweep, mirroring how the CUDA backward re-walks
tiles back-to-front).

Note: the CUDA kernel stops a pixel permanently once transmittance would
drop below 1e-4 (including skipping the crossing Gaussian). We composite
exactly instead; the difference is bounded by 1e-4 in color, far below
1/255 quantization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .binning import TileLists
from .projection import MIN_ALPHA, ProjectedGaussians

MAX_ALPHA = 0.99


def composite_tiles(
    projected: ProjectedGaussians,
    tiles: TileLists,
    image_shape: tuple[int, int],
    background: jax.Array,  # (channels,)
    tile_size: int = 16,
    chunk: int = 128,
) -> jax.Array:
    """Returns (channels, h, w) composited image."""
    h, w = image_shape
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    channels = projected.color.shape[-1]
    num_tiles, capacity = tiles.indices.shape

    # Depth-sorted parameter arrays.
    mean2d = projected.mean2d[tiles.order]
    conic = projected.conic[tiles.order]
    color = projected.color[tiles.order]
    opacity = projected.opacity[tiles.order]
    valid = projected.valid[tiles.order]

    # Pad the per-tile lists to a multiple of the chunk size.
    pad = (-capacity) % chunk
    indices = jnp.pad(tiles.indices, ((0, 0), (0, pad)))
    list_valid = jnp.pad(tiles.valid, ((0, 0), (0, pad)))
    n_chunks = indices.shape[1] // chunk
    indices = indices.reshape(num_tiles, n_chunks, chunk).transpose(1, 0, 2)
    list_valid = list_valid.reshape(num_tiles, n_chunks, chunk).transpose(1, 0, 2)

    # Per-tile pixel coordinates (pixel centers at integer coordinates).
    p = tile_size * tile_size
    tile_ids = jnp.arange(num_tiles)
    tile_x0 = (tile_ids % tiles_x) * tile_size
    tile_y0 = (tile_ids // tiles_x) * tile_size
    within = jnp.arange(p)
    pix_x = tile_x0[:, None] + (within % tile_size)[None, :]  # (T, P)
    pix_y = tile_y0[:, None] + (within // tile_size)[None, :]
    pix_x = pix_x.astype(mean2d.dtype)
    pix_y = pix_y.astype(mean2d.dtype)

    @jax.checkpoint
    def body(carry, chunk_data):
        trans, acc = carry  # (T, P), (T, P, channels)
        idx, ok = chunk_data  # (T, C), (T, C)
        m = mean2d[idx]  # (T, C, 2)
        cn = conic[idx]  # (T, C, 3)
        cl = color[idx]  # (T, C, channels)
        op = opacity[idx]  # (T, C)
        ok = ok & valid[idx]

        dx = pix_x[:, None, :] - m[..., 0][..., None]  # (T, C, P)
        dy = pix_y[:, None, :] - m[..., 1][..., None]
        power = (
            -0.5 * (cn[..., 0][..., None] * dx * dx + cn[..., 2][..., None] * dy * dy)
            - cn[..., 1][..., None] * dx * dy
        )
        alpha = jnp.minimum(MAX_ALPHA, op[..., None] * jnp.exp(power))
        alpha = jnp.where(
            ok[..., None] & (power <= 0) & (alpha >= MIN_ALPHA), alpha, 0.0
        )

        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)  # inclusive, along chunk
        t_before = trans[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        )
        weight = alpha * t_before  # (T, C, P)
        acc = acc + jnp.einsum("tcp,tcx->tpx", weight, cl)
        trans = trans * cum[:, -1]
        return (trans, acc), None

    trans0 = jnp.ones((num_tiles, p), mean2d.dtype)
    acc0 = jnp.zeros((num_tiles, p, channels), mean2d.dtype)
    (trans, acc), _ = jax.lax.scan(body, (trans0, acc0), (indices, list_valid))

    image = acc + trans[..., None] * background[None, None, :]

    # Reassemble tiles -> image, crop padding.
    image = image.reshape(tiles_y, tiles_x, tile_size, tile_size, channels)
    image = image.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * tile_size, tiles_x * tile_size, channels
    )
    return image[:h, :w].transpose(2, 0, 1)
