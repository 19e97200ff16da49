"""Gaussian projection to screen space (EWA splatting), in pure JAX.

Replaces the projection stage of the reference's CUDA rasterizer
(diff-gaussian-rasterization's preprocess kernel, driven from
/root/reference/src/model/decoder/cuda_splatting.py): world-space 3D
Gaussians are projected to 2D screen-space Gaussians (mean, conic, radius)
plus per-Gaussian view-dependent color from spherical harmonics.

Everything is batched over the Gaussian axis — large fused elementwise
chains plus small (3x3) matmul contractions, which XLA maps well onto the
TPU VPU/MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...geometry.projection import get_fov, inverse_se3
from ..sh import eval_sh


class ProjectedGaussians(NamedTuple):
    mean2d: jax.Array  # (g, 2) pixel coordinates (pixel centers at integers)
    conic: jax.Array  # (g, 3) inverse 2D covariance upper triangle (a, b, c)
    depth: jax.Array  # (g,) camera-space z
    radius: jax.Array  # (g,) screen-space radius in pixels (3 sigma)
    color: jax.Array  # (g, 3)
    opacity: jax.Array  # (g,)
    valid: jax.Array  # (g,) bool


# The reference rasterizer culls Gaussians closer than this hard-coded
# camera-space depth; the scale-invariant trick in the render wrappers
# (cuda_splatting.py:63-70) rescales the world so near maps to 1.0, keeping
# real geometry clear of this plane. We keep the same constant.
NEAR_CLIP = 0.2

# Low-pass dilation added to the 2D covariance diagonal (anti-aliasing),
# same constant as the CUDA kernel.
COV2D_DILATION = 0.3

MIN_ALPHA = 1.0 / 255.0


def project_gaussians(
    extrinsics: jax.Array,  # (4, 4) camera-to-world
    intrinsics: jax.Array,  # (3, 3) normalized
    image_shape: tuple[int, int],
    means: jax.Array,  # (g, 3)
    covariances: jax.Array,  # (g, 3, 3)
    opacities: jax.Array,  # (g,)
    harmonics: Optional[jax.Array] = None,  # (g, 3, d_sh) SH coefficients
    colors_precomp: Optional[jax.Array] = None,  # (g, 3) raw colors
) -> ProjectedGaussians:
    """Project one view's Gaussians to screen space.

    Exactly one of `harmonics` / `colors_precomp` must be given (mirrors the
    use_sh switch in the reference wrappers).
    """
    h, w = image_shape
    dtype = means.dtype

    w2c = inverse_se3(extrinsics)
    rot_w2c = w2c[:3, :3]
    cam_pos = extrinsics[:3, 3]

    # Camera-space positions.
    t = jnp.einsum("ij,gj->gi", rot_w2c, means) + w2c[:3, 3]
    tz = t[..., 2]
    depth = tz

    # Pixel-space focal lengths / principal point.
    fx = intrinsics[0, 0] * w
    fy = intrinsics[1, 1] * h
    cx = intrinsics[0, 2] * w
    cy = intrinsics[1, 2] * h

    fov = get_fov(intrinsics[None])[0]
    tan_fov_x = jnp.tan(0.5 * fov[0])
    tan_fov_y = jnp.tan(0.5 * fov[1])

    safe_tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    mean2d = jnp.stack(
        [
            fx * t[..., 0] / safe_tz + cx - 0.5,
            fy * t[..., 1] / safe_tz + cy - 0.5,
        ],
        axis=-1,
    )

    # EWA: J W Sigma W^T J^T with the frustum clamp the CUDA kernel applies
    # to the Jacobian's input point.
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    txz = jnp.clip(t[..., 0] / safe_tz, -lim_x, lim_x) * tz
    tyz = jnp.clip(t[..., 1] / safe_tz, -lim_y, lim_y) * tz
    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    j = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * txz * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * tyz * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (g, 2, 3)
    jw = jnp.einsum("gij,jk->gik", j, rot_w2c)  # (g, 2, 3)
    cov2d = jnp.einsum("gik,gkl,gjl->gij", jw, covariances, jw)  # (g, 2, 2)
    a = cov2d[..., 0, 0] + COV2D_DILATION
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + COV2D_DILATION

    det = a * c - b * b
    safe_det = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / safe_det, -b / safe_det, a / safe_det], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Screen-bounds cull: the Gaussian's bbox must intersect the image.
    on_screen = (
        (mean2d[..., 0] + radius > 0)
        & (mean2d[..., 0] - radius < w)
        & (mean2d[..., 1] + radius > 0)
        & (mean2d[..., 1] - radius < h)
    )
    valid = (depth > NEAR_CLIP) & (det > 0) & on_screen & (opacities > MIN_ALPHA)

    if (harmonics is None) == (colors_precomp is None):
        raise ValueError("Provide exactly one of harmonics / colors_precomp.")
    if harmonics is not None:
        view_dir = means - cam_pos
        view_dir = view_dir / (
            jnp.linalg.norm(view_dir, axis=-1, keepdims=True) + 1e-12
        )
        color = eval_sh(harmonics, view_dir)
    else:
        color = colors_precomp

    return ProjectedGaussians(
        mean2d=mean2d.astype(dtype),
        conic=conic.astype(dtype),
        depth=depth,
        radius=jnp.where(valid, radius, 0.0),
        color=color.astype(dtype),
        opacity=opacities,
        valid=valid,
    )
