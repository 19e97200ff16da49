"""Batch schema types (reference: /root/reference/src/dataset/types.py).

Batches are plain dicts of numpy/JAX arrays:

views = {
    "extrinsics": (v, 4, 4) or batched (b, v, 4, 4),
    "intrinsics": (v, 3, 3),
    "image": (v, 3, h, w) float in [0, 1],
    "near": (v,),
    "far": (v,),
    "index": (v,),
}
example = {"context": views, "target": views, "scene": str}
"""

from __future__ import annotations

from typing import Any, Callable, Literal

Stage = Literal["train", "val", "test"]

AnyViews = dict
AnyExample = dict
BatchedViews = dict
BatchedExample = dict

# A data shim modifies a batched example (on host or device).
DataShim = Callable[[BatchedExample], BatchedExample]
