"""Depth <-> relative-disparity conversions (linear in disparity).

Mirrors /root/reference/src/model/encoder/epipolar/conversions.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relative_disparity_to_depth(
    relative_disparity: jax.Array,
    near: jax.Array,
    far: jax.Array,
    eps: float = 1e-10,
) -> jax.Array:
    """0 maps to near, 1 maps to far."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    return 1.0 / ((1.0 - relative_disparity) * (disp_near - disp_far) + disp_far + eps)


def depth_to_relative_disparity(
    depth: jax.Array,
    near: jax.Array,
    far: jax.Array,
    eps: float = 1e-10,
) -> jax.Array:
    """near maps to 0, far maps to 1."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    disp = 1.0 / (depth + eps)
    return 1.0 - (disp - disp_far) / (disp_near - disp_far + eps)
