"""Patch shim: center-crop batched images to a multiple of patch_size.

Mirrors /root/reference/src/dataset/shims/patch_shim.py. Runs on device
(JAX arrays) as part of the encoder's data shim.
"""

from __future__ import annotations

from ..types import BatchedExample, BatchedViews


def apply_patch_shim_to_views(views: BatchedViews, patch_size: int) -> BatchedViews:
    *_, h, w = views["image"].shape
    assert h % 2 == 0 and w % 2 == 0

    h_new = (h // patch_size) * patch_size
    row = (h - h_new) // 2
    w_new = (w // patch_size) * patch_size
    col = (w - w_new) // 2

    image = views["image"][..., row : row + h_new, col : col + w_new]
    intrinsics = views["intrinsics"]
    # fx *= w / w_new; fy *= h / h_new (normalized intrinsics).
    if hasattr(intrinsics, "at"):
        intrinsics = (
            intrinsics.at[..., 0, 0]
            .multiply(w / w_new)
            .at[..., 1, 1]
            .multiply(h / h_new)
        )
    else:
        intrinsics = _numpy_fixup(intrinsics, w / w_new, h / h_new)
    return {**views, "image": image, "intrinsics": intrinsics}


def _numpy_fixup(intrinsics, sx, sy):
    intrinsics = intrinsics.copy()
    intrinsics[..., 0, 0] *= sx
    intrinsics[..., 1, 1] *= sy
    return intrinsics


def apply_patch_shim(batch: BatchedExample, patch_size: int) -> BatchedExample:
    return {
        **batch,
        "context": apply_patch_shim_to_views(batch["context"], patch_size),
        "target": apply_patch_shim_to_views(batch["target"], patch_size),
    }
