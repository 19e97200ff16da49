"""Golden parity of the dataset shims against the reference torch code.

Runs the reference's bounds / patch / crop / augmentation shims
(/root/reference/src/dataset/shims/*.py) via tests/torch_shims.py and
asserts our numpy implementations produce identical batches.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch


def _reference():
    import torch_shims

    torch_shims.install_shims()
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _batched_example(b=2, v=3, h=32, w=48, tv=2, seed=0):
    rng = np.random.default_rng(seed)

    def views(n):
        extr = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
        extr[..., :3, 3] = rng.normal(0, 0.5, (b, n, 3))
        intr = np.tile(
            np.asarray(
                [[0.9, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]], np.float32
            ),
            (b, n, 1, 1),
        )
        return {
            "image": rng.uniform(0, 1, (b, n, 3, h, w)).astype(np.float32),
            "extrinsics": extr,
            "intrinsics": intr,
            "near": rng.uniform(0.5, 1.0, (b, n)).astype(np.float32),
            "far": rng.uniform(50, 100, (b, n)).astype(np.float32),
            "index": rng.integers(0, 100, (b, n)),
        }

    return {"context": views(v), "target": views(tv), "scene": ["s"] * b}


def _to_torch(tree):
    if isinstance(tree, dict):
        return {k: _to_torch(v) for k, v in tree.items()}
    if isinstance(tree, np.ndarray):
        return torch.from_numpy(np.ascontiguousarray(tree))
    return tree


def _assert_tree_close(ours, ref, path="", atol=1e-5):
    if isinstance(ref, dict):
        assert set(ours.keys()) == set(ref.keys()), (path, ours.keys(), ref.keys())
        for k in ref:
            _assert_tree_close(ours[k], ref[k], f"{path}/{k}", atol)
    elif isinstance(ref, torch.Tensor):
        np.testing.assert_allclose(
            np.asarray(ours, np.float64),
            ref.numpy().astype(np.float64),
            atol=atol,
            err_msg=path,
        )
    else:
        assert list(np.ravel(ours)) == list(np.ravel(ref)), path


def test_bounds_shim_matches_reference():
    _reference()
    from src.dataset.shims.bounds_shim import apply_bounds_shim as ref_shim

    from pixelsplat_tpu.dataset.shims.bounds_shim import apply_bounds_shim

    batch = _batched_example()
    ours = apply_bounds_shim(batch, near_disparity=3.0 * 32, far_disparity=0.5)
    ref = ref_shim(_to_torch(batch), near_disparity=3.0 * 32, far_disparity=0.5)
    _assert_tree_close(
        {"near": ours["context"]["near"], "far": ours["context"]["far"]},
        {"near": ref["context"]["near"], "far": ref["context"]["far"]},
        "context",
        atol=1e-4,
    )
    _assert_tree_close(
        {"near": ours["target"]["near"], "far": ours["target"]["far"]},
        {"near": ref["target"]["near"], "far": ref["target"]["far"]},
        "target",
        atol=1e-4,
    )


def test_patch_shim_matches_reference():
    _reference()
    from src.dataset.shims.patch_shim import apply_patch_shim as ref_shim

    from pixelsplat_tpu.dataset.shims.patch_shim import apply_patch_shim

    batch = _batched_example(h=34, w=46)  # even but not patch multiples
    ours = apply_patch_shim(batch, patch_size=8)
    ref = ref_shim(_to_torch(batch), patch_size=8)
    for side in ("context", "target"):
        _assert_tree_close(
            {k: ours[side][k] for k in ("image", "intrinsics")},
            {k: ref[side][k] for k in ("image", "intrinsics")},
            side,
        )


def test_augmentation_shim_matches_reference():
    _reference()
    from src.dataset.shims.augmentation_shim import (
        reflect_extrinsics as ref_reflect,
    )

    from pixelsplat_tpu.dataset.shims.augmentation_shim import (
        reflect_extrinsics,
    )

    rng = np.random.default_rng(0)
    extr = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    extr[:, :3, 3] = rng.normal(0, 1, (4, 3)).astype(np.float32)
    # A couple of nontrivial rotations.
    th = 0.7
    extr[1, :3, :3] = np.asarray(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    ours = reflect_extrinsics(extr)
    ref = ref_reflect(torch.from_numpy(extr))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_crop_shim_matches_reference_intrinsics():
    """The reference crop shim resizes with PIL; image parity is covered
    by our own resampling tests, but the intrinsics math (scale + crop
    recentering) must match exactly."""
    _reference()
    from src.dataset.shims.crop_shim import apply_crop_shim as ref_shim

    from pixelsplat_tpu.dataset.shims.crop_shim import apply_crop_shim

    batch = _batched_example(b=1, h=40, w=64, seed=3)
    example = {
        "context": {
            k: v[0] for k, v in batch["context"].items()
        },
        "target": {k: v[0] for k, v in batch["target"].items()},
        "scene": "s",
    }
    ours = apply_crop_shim(example, (32, 32))
    ref = ref_shim(_to_torch(example), (32, 32))
    for side in ("context", "target"):
        np.testing.assert_allclose(
            np.asarray(ours[side]["intrinsics"], np.float64),
            ref[side]["intrinsics"].numpy().astype(np.float64),
            atol=1e-5,
            err_msg=side,
        )
        assert tuple(np.asarray(ours[side]["image"]).shape[-2:]) == (32, 32)
        assert tuple(ref[side]["image"].shape[-2:]) == (32, 32)