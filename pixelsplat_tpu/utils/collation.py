"""Nested dict-of-array tree merging (reference: src/misc/collation.py)."""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

Tree = Union[dict, jax.Array]


def collate(trees: list[Tree], merge_fn: Callable = jnp.stack) -> Tree:
    """Merge a list of nested dict trees leaf-wise with merge_fn."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: collate([t[k] for t in trees], merge_fn) for k in first}
    return merge_fn(trees)
