"""Encoder data shims (device-side batch preprocessing).

Mirrors the reference's get_data_shim mechanism
(/root/reference/src/model/encoder/encoder_epipolar.py:215-230 and
src/dataset/data_module.py:17-32): the encoder contributes batch
transforms that run on device right before the forward pass.
"""

from __future__ import annotations

from typing import Callable

from ...dataset.shims.bounds_shim import apply_bounds_shim
from ...dataset.shims.patch_shim import apply_patch_shim
from ...dataset.types import BatchedExample
from .encoder_epipolar import EncoderEpipolarCfg

DataShim = Callable[[BatchedExample], BatchedExample]


def get_data_shim(cfg: EncoderEpipolarCfg) -> DataShim:
    def data_shim(batch: BatchedExample) -> BatchedExample:
        batch = apply_patch_shim(
            batch,
            patch_size=cfg.epipolar_transformer.self_attention.patch_size
            * cfg.epipolar_transformer.downscale,
        )
        if cfg.apply_bounds_shim:
            _, _, _, h, w = batch["context"]["image"].shape
            near_disparity = cfg.near_disparity * min(h, w)
            batch = apply_bounds_shim(batch, near_disparity, 0.5)
        return batch

    return data_shim
