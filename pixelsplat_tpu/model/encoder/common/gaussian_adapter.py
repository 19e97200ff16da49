"""Gaussian adapter: raw network features → world-space 3D Gaussians.

Mirrors /root/reference/src/model/encoder/common/gaussian_adapter.py:
scales sigmoid-mapped into [scale_min, scale_max] and modulated by
depth x pixel size, normalized xyzw quaternions, SH coefficients damped at
init by a per-degree mask, covariance rotated into world space by the
camera rotation, means unprojected along pixel rays, SH rotated to world.

Unlike the reference (which evaluates e3nn Wigner matrices per Gaussian),
the SH rotation matrices here are computed once per *view* (they only
depend on the camera rotation) and broadcast over rays/samples.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ....geometry.projection import get_world_rays
from ....ops.sh import apply_sh_rotation, full_sh_rotation_matrix
from .gaussians import build_world_covariance


@dataclass(frozen=True)
class GaussianAdapterCfg:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 4


class AdaptedGaussians(NamedTuple):
    means: jax.Array  # (..., 3)
    covariances: jax.Array  # (..., 3, 3)
    scales: jax.Array  # (..., 3) pre-world-rotation (ply export only)
    rotations: jax.Array  # (..., 4) pre-world-rotation (ply export only)
    # World-frame SH, BROADCASTABLE against (*opacities.shape, 3, d_sh)
    # but not materialized to it: coefficients are shared across the
    # per-pixel depth-sample axis (raw_gaussians' size-1 axes), and the
    # sample repeat of this largest attribute is left to the consumer —
    # the AoS packing flattens it; the SoA eval path never repeats it.
    harmonics: jax.Array
    opacities: jax.Array  # (...)


class GaussianAdapter:
    """Stateless (no learnable parameters)."""

    def __init__(self, cfg: GaussianAdapterCfg):
        self.cfg = cfg
        # Damp higher-order SH at initialization.
        mask = np.ones(self.d_sh, np.float32)
        for degree in range(1, cfg.sh_degree + 1):
            mask[degree**2 : (degree + 1) ** 2] = 0.1 * 0.25**degree
        self.sh_mask = jnp.asarray(mask)

    @property
    def d_sh(self) -> int:
        return (self.cfg.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        return 7 + 3 * self.d_sh

    def __call__(
        self,
        extrinsics: jax.Array,  # (*#batch, 4, 4)
        intrinsics: jax.Array,  # (*#batch, 3, 3)
        coordinates: jax.Array,  # (*#batch, 2)
        depths: jax.Array,  # (*#batch)
        opacities: jax.Array,  # (*#batch)
        raw_gaussians: jax.Array,  # (*#batch, d_in)
        image_shape: tuple[int, int],
        eps: float = 1e-8,
    ) -> AdaptedGaussians:
        cfg = self.cfg
        scales, rotations, sh = jnp.split(raw_gaussians, [3, 7], axis=-1)

        scales = cfg.gaussian_scale_min + (
            cfg.gaussian_scale_max - cfg.gaussian_scale_min
        ) * jax.nn.sigmoid(scales)
        h, w = image_shape
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], scales.dtype)
        multiplier = self.get_scale_multiplier(intrinsics, pixel_size)
        scales = scales * depths[..., None] * multiplier[..., None]

        rotations = rotations / (
            jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
        )

        sh = sh.reshape(*sh.shape[:-1], 3, self.d_sh)

        c2w_rotations = extrinsics[..., :3, :3]
        # Fused (W R) diag(s)^2 (W R)^T without (..., 3, 3) intermediates.
        covariances = build_world_covariance(scales, rotations, c2w_rotations)

        # World-frame SH: rotate the *un-broadcast* per-pixel coefficients
        # (one rotation per camera) and fold the per-degree init damping
        # into the tiny rotation matrix — M @ diag(mask) — instead of a
        # full-tensor multiply; the sample-axis repeat stays lazy until the
        # caller's final flatten.
        sh_m = full_sh_rotation_matrix(c2w_rotations, self.cfg.sh_degree)
        sh_m = sh_m * self.sh_mask  # scales columns j: rotate(mask ⊙ sh)
        harmonics = apply_sh_rotation(sh, sh_m[..., None, :, :])

        origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
        means = origins + directions * depths[..., None]

        return AdaptedGaussians(
            means=means,
            covariances=covariances,
            harmonics=harmonics,
            opacities=opacities,
            scales=scales,
            rotations=jnp.broadcast_to(rotations, (*scales.shape[:-1], 4)),
        )

    def get_scale_multiplier(
        self,
        intrinsics: jax.Array,
        pixel_size: jax.Array,
        multiplier: float = 0.1,
    ) -> jax.Array:
        # Closed-form 2x2 inverse of the focal block.
        a = intrinsics[..., 0, 0]
        b = intrinsics[..., 0, 1]
        c = intrinsics[..., 1, 0]
        d = intrinsics[..., 1, 1]
        det = a * d - b * c
        inv = (
            jnp.stack(
                [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)],
                axis=-2,
            )
            / det[..., None, None]
        )
        xy_multipliers = multiplier * jnp.einsum("...ij,j->...i", inv, pixel_size)
        return xy_multipliers.sum(axis=-1)
