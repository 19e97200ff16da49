"""Encoder registry.

Counterpart of /root/reference/src/model/encoder/__init__.py:8-20: maps the
config's encoder name to (encoder module, visualizer factory). New encoder
families register here.
"""

from __future__ import annotations

from typing import Callable, Optional

from .encoder_epipolar import EncoderEpipolar, EncoderEpipolarCfg

ENCODERS: dict[str, tuple[type, Optional[Callable]]] = {}


def _visualizer_epipolar(encoder, params):
    from .visualization.encoder_visualizer_epipolar import (
        EncoderVisualizerEpipolar,
        EncoderVisualizerEpipolarCfg,
    )

    return EncoderVisualizerEpipolar(EncoderVisualizerEpipolarCfg(), encoder, params)


ENCODERS["epipolar"] = (EncoderEpipolar, _visualizer_epipolar)


def get_encoder(cfg) -> tuple:
    """cfg is any encoder cfg dataclass with a `name` discriminator.

    Returns (encoder_module, visualizer_factory | None); the factory takes
    (encoder, params) once they exist.
    """
    encoder_cls, visualizer = ENCODERS[cfg.name]
    return encoder_cls(cfg), visualizer


__all__ = ["ENCODERS", "get_encoder", "EncoderEpipolar", "EncoderEpipolarCfg"]
