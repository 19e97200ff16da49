"""Occupancy-adaptive rendering for evaluation/visualization loops.

The rasterizer is a static-shape pipeline: binning, sorting and list
assembly run at the configured per-tile capacity whether tiles are full
or nearly empty, so render cost is scene-independent (PERF.md). Trained
scenes concentrate Gaussians on surfaces and rarely approach the
worst-case capacity; for host-driven loops (test protocol, video
rendering) `render_adaptive` measures the actual maximum per-tile
occupancy with a cheap jitted pre-pass and dispatches to a render
compiled at the smallest sufficient capacity — overflow-free by
construction.

Not for use inside a single jitted training step (the capacity choice is
a host-side branch); the training path keeps its fixed worst-case
setting. Each distinct capacity compiles once and is cached by jit.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp

from .binning import tile_occupancy
from .projection import project_gaussians
from .render import DEFAULT_SETTINGS, RenderSettings, render


@partial(jax.jit, static_argnames=("image_shape", "tile_size", "span", "big_capacity"))
def _max_occupancy(
    extrinsics: jax.Array,  # (b, 4, 4)
    intrinsics: jax.Array,  # (b, 3, 3)
    near: jax.Array,  # (b,)
    means: jax.Array,  # (b, g, 3)
    covariances: jax.Array,  # (b, g, 3, 3)
    opacities: jax.Array,  # (b, g)
    image_shape: tuple[int, int],
    tile_size: int,
    span: int,
    big_capacity: int,
) -> jax.Array:
    def one(e, k, n, m, c, o):
        scale = 1.0 / n
        proj = project_gaussians(
            e.at[:3, 3].multiply(scale),
            k,
            image_shape,
            m * scale,
            c * scale**2,
            o,
            colors_precomp=jnp.zeros((m.shape[0], 1), m.dtype),
        )
        return tile_occupancy(
            proj,
            image_shape,
            tile_size=tile_size,
            span=span,
            big_capacity=big_capacity,
        )

    return jax.vmap(one)(
        extrinsics, intrinsics, near, means, covariances, opacities
    ).max()


def choose_settings(
    extrinsics: jax.Array,  # (b, 4, 4) representative cameras for the scene
    intrinsics: jax.Array,
    near: jax.Array,
    gaussian_means: jax.Array,
    gaussian_covariances: jax.Array,
    gaussian_opacities: jax.Array,
    image_shape: tuple[int, int],
    settings: RenderSettings = DEFAULT_SETTINGS,
    capacities: tuple[int, ...] = (512, 1024, 2048),
) -> RenderSettings:
    """Pick the smallest sufficient capacity ONCE per scene.

    The occupancy pre-pass costs one device sync, so call this per scene
    (or per trajectory) and reuse the returned settings for every view —
    not per frame.
    """
    max_count = int(
        _max_occupancy(
            extrinsics,
            intrinsics,
            near,
            gaussian_means,
            gaussian_covariances,
            gaussian_opacities,
            image_shape,
            settings.tile_size,
            settings.span,
            settings.big_capacity,
        )
    )
    for c in sorted(capacities):
        if max_count <= c and c <= settings.capacity:
            return replace(settings, capacity=c)
    return settings


def render_adaptive(
    extrinsics: jax.Array,  # (b, 4, 4)
    intrinsics: jax.Array,  # (b, 3, 3)
    near: jax.Array,  # (b,)
    far: jax.Array,  # (b,)
    image_shape: tuple[int, int],
    background_color: jax.Array,
    gaussian_means: jax.Array,
    gaussian_covariances: jax.Array,
    gaussian_sh_coefficients: jax.Array,
    gaussian_opacities: jax.Array,
    use_sh: bool = True,
    settings: RenderSettings = DEFAULT_SETTINGS,
    capacities: tuple[int, ...] = (512, 1024, 2048),
) -> jax.Array:
    """`render` dispatched at the smallest sufficient per-tile capacity.

    Falls back to `settings.capacity` when the scene exceeds every
    candidate. Matches `render(..., scale_invariant=True)` exactly for
    any sufficient capacity (lists are complete, so compositing is
    identical).
    """
    chosen = choose_settings(
        extrinsics,
        intrinsics,
        near,
        gaussian_means,
        gaussian_covariances,
        gaussian_opacities,
        image_shape,
        settings=settings,
        capacities=capacities,
    )
    return render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        background_color,
        gaussian_means,
        gaussian_covariances,
        gaussian_sh_coefficients,
        gaussian_opacities,
        scale_invariant=True,
        use_sh=use_sh,
        settings=chosen,
    )
