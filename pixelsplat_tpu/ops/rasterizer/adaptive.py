"""Occupancy-adaptive rendering for evaluation/visualization loops.

The rasterizer is a static-shape pipeline: binning, sorting and list
assembly run at the configured per-tile capacity whether tiles are full
or nearly empty, so render cost is scene-independent (PERF.md). Trained
scenes concentrate Gaussians on surfaces and rarely approach the
worst-case capacity; for host-driven loops (test protocol, video
rendering) `render_adaptive` measures the actual per-tile occupancy and
flat-pair demand with a cheap jitted pre-pass and dispatches to a render
compiled at the smallest sufficient capacity AND pair budget —
overflow-free by construction (the probe is a bbox-level upper bound on
what binning, which additionally ellipse-culls, produces). The pair
budget drives the u16 parameter-row gather and the list-assembly scan,
both of which are row/slot-count-bound, so a typical trained scene
(~1.3 pairs/Gaussian) renders meaningfully faster than the worst-case
2x-Gaussians default.

Not for use inside a single jitted training step (the capacity choice is
a host-side branch); the training path keeps its fixed worst-case
setting. Each distinct (capacity, pair_budget) compiles once and is
cached by jit.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp

from .binning import tile_occupancy
from .projection import project_gaussians
from .render import DEFAULT_SETTINGS, RenderSettings, render


@partial(
    jax.jit,
    static_argnames=("image_shape", "tile_size", "span", "big_capacity", "chunk"),
)
def _occupancy_stats(
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
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Max per-tile count and max flat-budget demand over the b views."""

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
            chunk=chunk,
        )

    max_counts, budgets = jax.vmap(one)(
        extrinsics, intrinsics, near, means, covariances, opacities
    )
    return max_counts.max(), budgets.max()


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
    margin: float = 1.0,
) -> RenderSettings:
    """Pick the smallest sufficient capacity + pair budget ONCE per scene.

    The occupancy pre-pass costs one device sync, so call this per scene
    (or per trajectory) and reuse the returned settings for every view —
    not per frame. `margin` scales both stats before choosing, for
    callers whose render cameras only approximate the probed ones (e.g.
    a video trajectory probed at its endpoints); renders should surface
    `overflow` regardless.
    """
    max_count, budget = (
        jax.device_get(v)
        for v in _occupancy_stats(
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
            settings.chunk,
        )
    )
    max_count = int(max_count * margin)
    # One alignment chunk per tile of slack when the margin inflates
    # per-tile counts across chunk boundaries.
    h, w = image_shape
    num_tiles = (-(-w // settings.tile_size)) * (-(-h // settings.tile_size))
    budget = int(budget * margin) + (num_tiles * settings.chunk if margin > 1 else 0)

    chosen = settings
    for c in sorted(capacities):
        if max_count <= c and c <= settings.capacity:
            chosen = replace(settings, capacity=c)
            break
    # The measured demand is an upper bound on what binning produces, so
    # this budget is overflow-free — including dense scenes where it
    # exceeds binning's 2x-Gaussians default (which would have dropped
    # pairs). Cap at the static worst case.
    g = gaussian_means.shape[1]
    worst = settings.span**2 * g + num_tiles * (
        settings.big_capacity + settings.chunk
    )
    pair_budget = -(-max(min(budget, worst), 65536) // settings.chunk) * settings.chunk
    return replace(chosen, pair_budget=pair_budget)


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
