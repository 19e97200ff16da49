"""Gaussian projection: 3D world Gaussians → screen-space splats.

Re-implements the projection stage of the reference's CUDA rasterizer
(diff-gaussian-rasterization preprocessCUDA: EWA splatting of the 3x3
covariance to a 2D conic, frustum cull, 3-sigma radius, SH color), as
TPU-friendly vector code.

Layout note: all per-Gaussian outputs are structure-of-arrays — plain
(g,) vectors (and (channels, g) colors) — so the Gaussian axis is the
TPU lane dimension. Array-of-structs shapes like (g, 3) put a size-3
axis minor-most, which pads to the 128-lane vector registers and made
this stage ~4x slower.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.projection import get_fov, inverse_se3
from ..sh import sh_basis_components


class GaussiansSoA(NamedTuple):
    """Scene Gaussians in structure-of-arrays form (g minor everywhere).

    Packing once per scene — instead of transposing means/covariances/
    harmonics inside every per-view projection — keeps the per-view render
    free of large relayout passes (the encoder→decoder boundary copies
    were ~5.8 ms/scene at production scale before this existed).
    """

    mean_x: jax.Array  # (g,) world x
    mean_y: jax.Array  # (g,)
    mean_z: jax.Array  # (g,)
    cov: jax.Array  # (6, g) rows s00, s01, s02, s11, s12, s22
    opacity: jax.Array  # (g,)
    # Either dense (ch, d_sh, g), or sample-shared (ch, d_sh, V, 1, R)
    # with g = V * S * R: the size-1 axis broadcasts over S depth samples
    # per ray (pixelsplat's gaussians_per_pixel share one SH coefficient
    # set per pixel), so the S-fold repeat of the largest per-Gaussian
    # attribute is never materialized — the per-view SH evaluation
    # broadcasts it instead. Requires the g-order contract (V, S, R).
    harmonics: Optional[jax.Array] = None
    colors: Optional[jax.Array] = None  # (ch, g)


def pack_gaussians_soa(
    means: jax.Array,  # (g, 3)
    covariances: jax.Array,  # (g, 3, 3)
    opacities: jax.Array,  # (g,)
    harmonics: Optional[jax.Array] = None,  # (g, 3, d_sh)
    colors_precomp: Optional[jax.Array] = None,  # (g, c)
) -> GaussiansSoA:
    """One relayout pass from the public AoS layout to SoA."""
    if (harmonics is None) == (colors_precomp is None):
        raise ValueError("Provide exactly one of harmonics / colors_precomp.")
    means_t = means.T  # (3, g)
    g = means.shape[0]
    cov_t = covariances.reshape(g, 9).T  # (9, g) one relayout pass
    cov6 = jnp.stack(
        [cov_t[0], cov_t[1], cov_t[2], cov_t[4], cov_t[5], cov_t[8]]
    )
    return GaussiansSoA(
        mean_x=means_t[0],
        mean_y=means_t[1],
        mean_z=means_t[2],
        cov=cov6,
        opacity=opacities,
        harmonics=None if harmonics is None else harmonics.transpose(1, 2, 0),
        colors=None if colors_precomp is None else colors_precomp.T,
    )


class ProjectedGaussians(NamedTuple):
    mean_x: jax.Array  # (g,) pixel x (pixel centers at integers)
    mean_y: jax.Array  # (g,) pixel y
    conic_a: jax.Array  # (g,) inverse 2D covariance upper triangle a
    conic_b: jax.Array  # (g,) ... b
    conic_c: jax.Array  # (g,) ... c
    depth: jax.Array  # (g,) camera-space z
    # Per-axis half-extents (pixels) of the region where alpha can reach
    # MIN_ALPHA: sqrt(t * cov2d_diag) with t = 2 ln(255 * opacity).
    # Tighter than the CUDA reference's circular 3-sigma radius (which
    # ignores opacity and anisotropy) yet renders identically: pixels
    # outside have alpha < MIN_ALPHA, which compositing zeroes anyway.
    radius_x: jax.Array  # (g,)
    radius_y: jax.Array  # (g,)
    color: jax.Array  # (channels, g)
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
    colors_precomp: Optional[jax.Array] = None,  # (g, c) raw colors
) -> ProjectedGaussians:
    """Project one view's Gaussians to screen space.

    Exactly one of `harmonics` / `colors_precomp` must be given (mirrors the
    use_sh switch in the reference wrappers).
    """
    soa = pack_gaussians_soa(
        means, covariances, opacities, harmonics, colors_precomp
    )
    return project_gaussians_soa(extrinsics, intrinsics, image_shape, soa)


def project_gaussians_soa(
    extrinsics: jax.Array,  # (4, 4) camera-to-world
    intrinsics: jax.Array,  # (3, 3) normalized
    image_shape: tuple[int, int],
    soa: GaussiansSoA,
) -> ProjectedGaussians:
    """SoA-input projection: no per-view relayouts of the Gaussian set.

    Multi-view decoders pack the scene once (`pack_gaussians_soa`) and
    call this per view.
    """
    h, w = image_shape
    dtype = soa.mean_x.dtype

    w2c = inverse_se3(extrinsics)
    rot = w2c[:3, :3]
    cam_pos = extrinsics[:3, 3]

    mx, my, mz = soa.mean_x, soa.mean_y, soa.mean_z
    opacities = soa.opacity

    # Camera-space positions (scalar x vector multiply-adds).
    tx = rot[0, 0] * mx + rot[0, 1] * my + rot[0, 2] * mz + w2c[0, 3]
    ty = rot[1, 0] * mx + rot[1, 1] * my + rot[1, 2] * mz + w2c[1, 3]
    tz = rot[2, 0] * mx + rot[2, 1] * my + rot[2, 2] * mz + w2c[2, 3]
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
    inv_z = 1.0 / safe_tz
    mean_x = fx * tx * inv_z + cx - 0.5
    mean_y = fy * ty * inv_z + cy - 0.5

    # EWA: J W Sigma W^T J^T with the frustum clamp the CUDA kernel applies
    # to the Jacobian's input point. J has rows
    #   [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2];
    # jw = J @ W is written out as scalar-vector products, and the 2x2
    # output quadratic form is expanded over the 6 unique Sigma entries.
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    txz = jnp.clip(tx * inv_z, -lim_x, lim_x) * tz
    tyz = jnp.clip(ty * inv_z, -lim_y, lim_y) * tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z2

    # jw rows: u_k = j00*W[0,k] + j02*W[2,k]; v_k = j11*W[1,k] + j12*W[2,k].
    u0 = j00 * rot[0, 0] + j02 * rot[2, 0]
    u1 = j00 * rot[0, 1] + j02 * rot[2, 1]
    u2 = j00 * rot[0, 2] + j02 * rot[2, 2]
    v0 = j11 * rot[1, 0] + j12 * rot[2, 0]
    v1 = j11 * rot[1, 1] + j12 * rot[2, 1]
    v2 = j11 * rot[1, 2] + j12 * rot[2, 2]

    s00, s01, s02 = soa.cov[0], soa.cov[1], soa.cov[2]
    s11, s12 = soa.cov[3], soa.cov[4]
    s22 = soa.cov[5]

    # Sigma @ u and Sigma @ v, then the quadratic forms.
    su0 = s00 * u0 + s01 * u1 + s02 * u2
    su1 = s01 * u0 + s11 * u1 + s12 * u2
    su2 = s02 * u0 + s12 * u1 + s22 * u2
    sv0 = s00 * v0 + s01 * v1 + s02 * v2
    sv1 = s01 * v0 + s11 * v1 + s12 * v2
    sv2 = s02 * v0 + s12 * v1 + s22 * v2
    a = u0 * su0 + u1 * su1 + u2 * su2 + COV2D_DILATION
    b = v0 * su0 + v1 * su1 + v2 * su2
    c = v0 * sv0 + v1 * sv1 + v2 * sv2 + COV2D_DILATION

    det = a * c - b * b
    safe_det = jnp.where(det <= 0, 1.0, det)
    conic_a = c / safe_det
    conic_b = -b / safe_det
    conic_c = a / safe_det

    # alpha(p) = op * exp(-q(p)/2) >= MIN_ALPHA iff q(p) <= t; the
    # ellipse q <= t spans +-sqrt(t * cov_xx) in x and +-sqrt(t * cov_yy)
    # in y (a and c are the dilated 2D covariance diagonal). The ceil
    # keeps the pixel-center coverage conservative.
    t_cut = 2.0 * jnp.log(jnp.maximum(opacities, MIN_ALPHA) / MIN_ALPHA)
    radius_x = jnp.ceil(jnp.sqrt(jnp.maximum(t_cut * a, 0.0)))
    radius_y = jnp.ceil(jnp.sqrt(jnp.maximum(t_cut * c, 0.0)))

    # Screen-bounds cull: the Gaussian's reachable box must intersect the
    # image.
    on_screen = (
        (mean_x + radius_x > 0)
        & (mean_x - radius_x < w)
        & (mean_y + radius_y > 0)
        & (mean_y - radius_y < h)
    )
    valid = (depth > NEAR_CLIP) & (det > 0) & on_screen & (opacities > MIN_ALPHA)

    if soa.harmonics is not None:
        dx = mx - cam_pos[0]
        dy = my - cam_pos[1]
        dz = mz - cam_pos[2]
        inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-24)
        harm = soa.harmonics  # (ch, d_sh, g) or (ch, d_sh, V, 1, R)
        channels, d_sh = harm.shape[0], harm.shape[1]
        g = mx.shape[0]
        basis = sh_basis_components(
            dx * inv_n,
            dy * inv_n,
            dz * inv_n,
            int(np.sqrt(d_sh)) - 1,
        )
        # (ch, d_sh, g) with a native axis-1 row-reduction. Per-channel
        # (1, g) slice-and-sum fusions read 8-sublane tiles at 1/8
        # utilization (3x 0.42 ms), and fully unrolled multiply-adds on
        # (g,) rows bait XLA into a d_sh-minor relayout of the whole
        # coefficient set whose layout preference poisons the co-jitted
        # encoder's convolutions (-27% scene throughput, round 5); the
        # reduce form runs at streaming bandwidth.
        basis_arr = jnp.stack(basis)  # (d_sh, g)
        if harm.ndim == 5:
            # Sample-shared coefficients: broadcast over the S sample axis
            # instead of reading an S-fold repeated table.
            v_sh, _, r_sh = harm.shape[2:]
            s_sh = g // (v_sh * r_sh)
            basis_r = basis_arr.reshape(d_sh, v_sh, s_sh, r_sh)
            color = (harm * basis_r[None]).sum(axis=1)  # (ch, V, S, R)
            color = color.reshape(channels, g)
        else:
            color = (harm * basis_arr[None]).sum(axis=1)  # (ch, g)
        # 3DGS convention: +0.5 offset, clamped at zero (computeColorFromSH).
        color = jnp.maximum(color + 0.5, 0.0)
    else:
        color = soa.colors  # (c, g)

    return ProjectedGaussians(
        mean_x=mean_x.astype(dtype),
        mean_y=mean_y.astype(dtype),
        conic_a=conic_a.astype(dtype),
        conic_b=conic_b.astype(dtype),
        conic_c=conic_c.astype(dtype),
        depth=depth,
        radius_x=jnp.where(valid, radius_x, 0.0),
        radius_y=jnp.where(valid, radius_y, 0.0),
        color=color.astype(dtype),
        opacity=opacities,
        valid=valid,
    )
