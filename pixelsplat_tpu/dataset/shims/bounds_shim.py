"""Bounds shim: near/far planes from a disparity-at-baseline heuristic.

Mirrors /root/reference/src/dataset/shims/bounds_shim.py. Runs on device
as part of the encoder's data shim (inputs are JAX arrays).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import BatchedExample


def compute_depth_for_disparity(
    extrinsics,  # (b, v, 4, 4)
    intrinsics,  # (b, v, 3, 3)
    image_shape: tuple[int, int],
    disparity: float,
    delta_min: float = 1e-6,
):
    """Depth at which the maximum camera baseline yields `disparity` pixels."""
    origins = extrinsics[..., :3, 3]
    deltas = jnp.linalg.norm(origins[:, None] - origins[:, :, None], axis=-1)
    deltas = jnp.maximum(deltas, delta_min)
    baselines = deltas.max(axis=(1, 2))  # (b,)

    h, w = image_shape
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], extrinsics.dtype)
    # inv of the 2x2 focal block applied to the pixel size.
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    pix = jnp.stack([pixel_size[0] / fx, pixel_size[1] / fy], axis=-1)  # (b, v, 2)
    mean_pixel_size = pix.mean(axis=(1, 2))  # (b,)

    return baselines / (disparity * mean_pixel_size)


def apply_bounds_shim(
    batch: BatchedExample,
    near_disparity: float,
    far_disparity: float,
) -> BatchedExample:
    context = batch["context"]
    _, cv, _, h, w = context["image"].shape
    near = compute_depth_for_disparity(
        context["extrinsics"], context["intrinsics"], (h, w), near_disparity
    )
    far = compute_depth_for_disparity(
        context["extrinsics"], context["intrinsics"], (h, w), far_disparity
    )
    target = batch["target"]
    tv = target["image"].shape[1]
    return {
        **batch,
        "context": {
            **context,
            "near": jnp.broadcast_to(near[:, None], (near.shape[0], cv)),
            "far": jnp.broadcast_to(far[:, None], (far.shape[0], cv)),
        },
        "target": {
            **target,
            "near": jnp.broadcast_to(near[:, None], (near.shape[0], tv)),
            "far": jnp.broadcast_to(far[:, None], (far.shape[0], tv)),
        },
    }
