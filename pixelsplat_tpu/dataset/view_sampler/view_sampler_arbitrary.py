"""Arbitrary (random or pinned) view sampler.

Mirrors /root/reference/src/dataset/view_sampler/view_sampler_arbitrary.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import numpy as np

from .view_sampler import ViewSampler
from .view_sampler_evaluation import add_third_context_index


@dataclass(frozen=True)
class ViewSamplerArbitraryCfg:
    name: Literal["arbitrary"] = "arbitrary"
    num_context_views: int = 2
    num_target_views: int = 1
    context_views: Optional[list[int]] = None
    target_views: Optional[list[int]] = None


class ViewSamplerArbitrary(ViewSampler[ViewSamplerArbitraryCfg]):
    def sample(
        self,
        scene: str,
        extrinsics: np.ndarray,
        intrinsics: np.ndarray,
        rng: np.random.Generator,
    ) -> tuple[np.ndarray, np.ndarray]:
        num_views = extrinsics.shape[0]
        index_context = rng.integers(0, num_views, size=(self.cfg.num_context_views,))
        if self.cfg.context_views is not None:
            index_context = np.asarray(self.cfg.context_views, dtype=np.int64)
            if self.cfg.num_context_views == 3 and len(self.cfg.context_views) == 2:
                index_context = add_third_context_index(index_context)
            else:
                assert len(self.cfg.context_views) == self.cfg.num_context_views
        index_target = rng.integers(0, num_views, size=(self.cfg.num_target_views,))
        if self.cfg.target_views is not None:
            assert len(self.cfg.target_views) == self.cfg.num_target_views
            index_target = np.asarray(self.cfg.target_views, dtype=np.int64)
        return index_context, index_target

    @property
    def num_context_views(self) -> int:
        return self.cfg.num_context_views

    @property
    def num_target_views(self) -> int:
        return self.cfg.num_target_views
