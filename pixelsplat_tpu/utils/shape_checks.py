"""Runtime shape checking at public API boundaries.

The reference enforces jaxtyping annotations at import time with beartype
(/root/reference/src/main.py:16-19) as its de-facto test harness. Here the
equivalent guard is explicit chex assertions at the layer interfaces —
they run at trace time (zero runtime cost under jit) and raise with the
offending shapes.
"""

from __future__ import annotations

import chex
import jax


def check_cameras(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    near: jax.Array,
    far: jax.Array,
    batch_dims: int = 2,
) -> None:
    """Validate (…, 4, 4) extrinsics / (…, 3, 3) intrinsics / (…,) bounds."""
    chex.assert_rank(extrinsics, batch_dims + 2)
    chex.assert_rank(intrinsics, batch_dims + 2)
    chex.assert_shape(extrinsics, (*extrinsics.shape[:-2], 4, 4))
    chex.assert_shape(intrinsics, (*intrinsics.shape[:-2], 3, 3))
    chex.assert_rank(near, batch_dims)
    chex.assert_rank(far, batch_dims)
    chex.assert_equal_shape([near, far])


def check_gaussians(means, covariances, harmonics, opacities) -> None:
    """Validate the Gaussians contract (b, g, …)."""
    b, g, three = means.shape
    chex.assert_shape(means, (b, g, 3))
    chex.assert_shape(covariances, (b, g, 3, 3))
    chex.assert_rank(harmonics, 4)
    chex.assert_shape(harmonics, (b, g, 3, harmonics.shape[-1]))
    chex.assert_shape(opacities, (b, g))


def check_context(context: dict) -> None:
    """Validate the batched context-views schema."""
    image = context["image"]
    chex.assert_rank(image, 5)  # (b, v, 3, h, w)
    b, v = image.shape[:2]
    chex.assert_shape(context["extrinsics"], (b, v, 4, 4))
    chex.assert_shape(context["intrinsics"], (b, v, 3, 3))
    chex.assert_shape(context["near"], (b, v))
    chex.assert_shape(context["far"], (b, v))
