"""Quaternion → rotation and covariance construction.

Mirrors /root/reference/src/model/encoder/common/gaussians.py (xyzw
quaternion order, covariance R S S^T R^T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 4) xyzw quaternions -> (..., 3, 3) rotation matrices."""
    i, j, k, r = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / ((quaternions * quaternions).sum(-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def build_covariance(scale: jax.Array, rotation_xyzw: jax.Array) -> jax.Array:
    """Covariance R diag(s)^2 R^T from per-axis scales and quaternions."""
    rotation = quaternion_to_matrix(rotation_xyzw)
    rs = rotation * scale[..., None, :]  # R @ diag(s)
    return jnp.einsum("...ik,...jk->...ij", rs, rs)
