"""Public rendering API: differentiable Gaussian splatting on TPU.

Mirrors the semantics of the reference's render wrappers
(/root/reference/src/model/decoder/cuda_splatting.py): `render` matches
`render_cuda` (including the scale-invariant 1/near world rescale that
keeps geometry clear of the rasterizer's hard near plane), `render_depth`
matches `render_depth_cuda`'s four depth modes, and `render_orthographic`
matches `render_cuda_orthographic`'s small-fov + camera-pushback trick.

Unlike the reference (Python loop over the batch, one CUDA launch per
view), the batch axis here is a `vmap`, so all views of a batch render in
one fused XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from ...geometry.projection import inverse_se3
from .binning import bin_gaussians
from .composite import composite_tiles
from .projection import (
    GaussiansSoA,
    pack_gaussians_soa,
    project_gaussians_soa,
)

DepthRenderingMode = Literal["depth", "disparity", "relative_disparity", "log"]


@dataclass(frozen=True)
class RenderSettings:
    """Static configuration of the tiled rasterizer."""

    tile_size: int = 16
    # Per-tile list capacity. Tiles receiving more Gaussians than this drop
    # the farthest ones (front-to-back order is preserved).
    capacity: int = 4096
    # Max tile span (per axis) binned per Gaussian; larger footprints go to
    # the global big list.
    span: int = 2
    big_capacity: int = 256
    # Depth-chunk size of the compositing scan.
    chunk: int = 128
    # Total (gaussian, tile) pair slots across all tiles (None = 2x the
    # Gaussian count). The flat pair array makes gather/DMA work scale
    # with actual pairs instead of tiles x capacity; overflow reports
    # when a scene exceeds it.
    pair_budget: Optional[int] = None
    # Force the two-word (tile, exact-depth) sort keys that binning
    # switches to automatically at very large tile counts (test hook).
    force_wide_keys: bool = False
    # Compositing backend: auto (Pallas on TPU, XLA scan on CPU),
    # or force one (the XLA path on TPU is an independent oracle).
    backend: str = "auto"


DEFAULT_SETTINGS = RenderSettings()


def _render_single(
    extrinsics: jax.Array,  # (4, 4)
    intrinsics: jax.Array,  # (3, 3) normalized
    near: jax.Array,  # ()
    far: jax.Array,  # ()
    background: jax.Array,  # (c,)
    means: jax.Array,  # (g, 3)
    covariances: jax.Array,  # (g, 3, 3)
    sh_or_colors: jax.Array,  # (g, 3, d_sh) or (g, c)
    opacities: jax.Array,  # (g,)
    *,
    image_shape: tuple[int, int],
    scale_invariant: bool,
    use_sh: bool,
    settings: RenderSettings,
    return_overflow: bool = False,
) -> jax.Array:
    soa = pack_gaussians_soa(
        means,
        covariances,
        opacities,
        harmonics=sh_or_colors if use_sh else None,
        colors_precomp=None if use_sh else sh_or_colors,
    )
    return render_view_soa(
        extrinsics,
        intrinsics,
        near,
        far,
        background,
        soa,
        image_shape=image_shape,
        scale_invariant=scale_invariant,
        settings=settings,
        return_overflow=return_overflow,
    )


def render_view_soa(
    extrinsics: jax.Array,  # (4, 4)
    intrinsics: jax.Array,  # (3, 3) normalized
    near: jax.Array,  # ()
    far: jax.Array,  # ()
    background: jax.Array,  # (c,)
    soa: GaussiansSoA,
    *,
    image_shape: tuple[int, int],
    scale_invariant: bool = True,
    settings: RenderSettings = DEFAULT_SETTINGS,
    return_overflow: bool = False,
) -> jax.Array:
    """Render one view of a pre-packed scene (see pack_gaussians_soa).

    Multi-view decoders pack the Gaussian set once and call this per
    view, so per-view cost excludes the scene-wide relayout passes.
    """
    if scale_invariant:
        # Rescale the world by 1/near so the hard 0.2 near clip in the
        # projector never bites real geometry (cuda_splatting.py:63-70).
        scale = 1.0 / near
        extrinsics = extrinsics.at[:3, 3].multiply(scale)
        soa = soa._replace(
            mean_x=soa.mean_x * scale,
            mean_y=soa.mean_y * scale,
            mean_z=soa.mean_z * scale,
            cov=soa.cov * scale**2,
        )

    projected = project_gaussians_soa(
        extrinsics,
        intrinsics,
        image_shape,
        soa,
    )
    tiles = bin_gaussians(
        projected,
        image_shape,
        tile_size=settings.tile_size,
        capacity=settings.capacity,
        span=settings.span,
        big_capacity=settings.big_capacity,
        chunk=settings.chunk,
        pair_budget=settings.pair_budget,
        force_wide_keys=settings.force_wide_keys,
    )
    if return_overflow:
        image = composite_tiles(
            projected,
            tiles,
            image_shape,
            background,
            tile_size=settings.tile_size,
            chunk=settings.chunk,
            capacity=settings.capacity,
            backend=settings.backend,
        )
        return image, tiles.overflow
    return composite_tiles(
        projected,
        tiles,
        image_shape,
        background,
        tile_size=settings.tile_size,
        chunk=settings.chunk,
        capacity=settings.capacity,
        backend=settings.backend,
    )


def render(
    extrinsics: jax.Array,  # (b, 4, 4)
    intrinsics: jax.Array,  # (b, 3, 3)
    near: jax.Array,  # (b,)
    far: jax.Array,  # (b,)
    image_shape: tuple[int, int],
    background_color: jax.Array,  # (b, c)
    gaussian_means: jax.Array,  # (b, g, 3)
    gaussian_covariances: jax.Array,  # (b, g, 3, 3)
    gaussian_sh_coefficients: jax.Array,  # (b, g, 3, d_sh) or (b, g, c)
    gaussian_opacities: jax.Array,  # (b, g)
    scale_invariant: bool = True,
    use_sh: bool = True,
    settings: RenderSettings = DEFAULT_SETTINGS,
    return_overflow: bool = False,
) -> jax.Array:
    """Render each batch element's Gaussians from its camera.

    Returns (b, c, h, w). Fully differentiable w.r.t. Gaussian parameters
    and cameras; integer binning decisions are non-differentiable by
    construction (as in the reference backward).

    With `return_overflow`, also returns the (b,) count of (gaussian,
    tile) pairs the binner dropped at capacity — the farthest Gaussians
    of overfull tiles silently vanish from the image, so training loops
    should surface this count (a nonzero value is a quality cliff the
    pixels won't show; the CUDA reference has no capacity and never
    drops).
    """
    import chex

    from ...utils.shape_checks import check_cameras, check_gaussians

    check_cameras(extrinsics, intrinsics, near, far, batch_dims=1)
    if use_sh:
        check_gaussians(
            gaussian_means,
            gaussian_covariances,
            gaussian_sh_coefficients,
            gaussian_opacities,
        )
    else:
        chex.assert_rank(gaussian_sh_coefficients, 3)  # (b, g, channels)
    fn = partial(
        _render_single,
        image_shape=image_shape,
        scale_invariant=scale_invariant,
        use_sh=use_sh,
        settings=settings,
        return_overflow=return_overflow,
    )
    operands = (
        extrinsics,
        intrinsics,
        near,
        far,
        background_color,
        gaussian_means,
        gaussian_covariances,
        gaussian_sh_coefficients,
        gaussian_opacities,
    )
    b = extrinsics.shape[0]
    if b == 1:
        # vmap of the sort/gather-heavy pipeline costs ~30 ms/frame even at
        # batch 1; the single-view eval path calls the plain program.
        out = fn(*[a[0] for a in operands])
        if return_overflow:
            return out[0][None], out[1][None]
        return out[None]
    return jax.vmap(fn)(*operands)


def depth_to_relative_disparity(
    depth: jax.Array, near: jax.Array, far: jax.Array, eps: float = 1e-10
) -> jax.Array:
    """0 at near, 1 at far (reference: epipolar/conversions.py)."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    disp = 1.0 / (depth + eps)
    return 1.0 - (disp - disp_far) / (disp_near - disp_far + eps)


def render_depth(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    near: jax.Array,
    far: jax.Array,
    image_shape: tuple[int, int],
    gaussian_means: jax.Array,
    gaussian_covariances: jax.Array,
    gaussian_opacities: jax.Array,
    scale_invariant: bool = True,
    mode: DepthRenderingMode = "depth",
    settings: RenderSettings = DEFAULT_SETTINGS,
) -> jax.Array:
    """Render camera-space depth as color (reference render_depth_cuda)."""
    cam_z = jnp.einsum(
        "bij,bgj->bgi",
        inverse_se3(extrinsics),
        jnp.concatenate(
            [gaussian_means, jnp.ones_like(gaussian_means[..., :1])], axis=-1
        ),
    )[..., 2]
    fake_color = cam_z
    if mode == "disparity":
        fake_color = 1.0 / cam_z
    elif mode == "relative_disparity":
        fake_color = depth_to_relative_disparity(cam_z, near[:, None], far[:, None])
    elif mode == "log":
        # The reference (cuda_splatting.py:251) chains minimum(near) then
        # maximum(far), which degenerates to a constant; we implement the
        # clearly intended clamp to [near, far].
        fake_color = jnp.log(jnp.clip(cam_z, near[:, None], far[:, None]))

    b = fake_color.shape[0]
    result = render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        jnp.zeros((b, 1), fake_color.dtype),
        gaussian_means,
        gaussian_covariances,
        fake_color[..., None],  # (b, g, 1) single channel
        gaussian_opacities,
        scale_invariant=scale_invariant,
        use_sh=False,
        settings=settings,
    )
    return result[:, 0]  # (b, h, w)


def orthographic_frustum(
    extrinsics: jax.Array,  # (b, 4, 4)
    width: jax.Array,  # (b,)
    height: jax.Array,  # (b,)
    near: jax.Array,  # (b,)
    far: jax.Array,  # (b,)
    fov_degrees: float = 0.1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """The narrow perspective frustum that emulates an orthographic camera.

    Returns (extrinsics, intrinsics, near, far) — the values the reference
    exposes through its `dump` dict (cuda_splatting.py:150-170) so figure
    scripts can project overlays into the orthographic render.
    """
    fov_x = jnp.deg2rad(jnp.asarray(fov_degrees, extrinsics.dtype))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance_to_near = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance_to_near
    near = near + distance_to_near
    far = far + distance_to_near
    b = extrinsics.shape[0]
    move_back = jnp.broadcast_to(jnp.eye(4, dtype=extrinsics.dtype), (b, 4, 4))
    move_back = move_back.at[:, 2, 3].set(-distance_to_near)
    extrinsics = jnp.einsum("bij,bjk->bik", extrinsics, move_back)

    # Equivalent normalized intrinsics for the narrow frustum.
    fx = 1.0 / (2.0 * tan_fov_x)
    fy = 1.0 / (2.0 * tan_fov_y)
    intrinsics = jnp.zeros((b, 3, 3), extrinsics.dtype)
    intrinsics = intrinsics.at[:, 0, 0].set(fx)
    intrinsics = intrinsics.at[:, 1, 1].set(fy)
    intrinsics = intrinsics.at[:, 0, 2].set(0.5)
    intrinsics = intrinsics.at[:, 1, 2].set(0.5)
    intrinsics = intrinsics.at[:, 2, 2].set(1.0)
    return extrinsics, intrinsics, near, far


def render_orthographic(
    extrinsics: jax.Array,  # (b, 4, 4)
    width: jax.Array,  # (b,)
    height: jax.Array,  # (b,)
    near: jax.Array,  # (b,)
    far: jax.Array,  # (b,)
    image_shape: tuple[int, int],
    background_color: jax.Array,
    gaussian_means: jax.Array,
    gaussian_covariances: jax.Array,
    gaussian_sh_coefficients: jax.Array,
    gaussian_opacities: jax.Array,
    fov_degrees: float = 0.1,
    use_sh: bool = True,
    settings: RenderSettings = DEFAULT_SETTINGS,
) -> jax.Array:
    """Fake orthographic render: tiny fov + camera push-back (reference
    render_cuda_orthographic, cuda_splatting.py:130-220)."""
    extrinsics, intrinsics, near, far = orthographic_frustum(
        extrinsics, width, height, near, far, fov_degrees
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
        scale_invariant=False,
        use_sh=use_sh,
        settings=settings,
    )
