"""Decoder registry.

Counterpart of /root/reference/src/model/decoder/__init__.py:5-13 — the
reference registers {"splatting_cuda"}; here the TPU splatting decoder is
registered under both "splatting" and the reference's name so existing
configs work unchanged.
"""

from __future__ import annotations

from .decoder_splatting import (
    DecoderOutput,
    DecoderSplatting,
    DecoderSplattingCfg,
    DepthRenderingMode,
)

DECODERS: dict[str, type] = {
    "splatting": DecoderSplatting,
    "splatting_cuda": DecoderSplatting,
}


def get_decoder(cfg) -> DecoderSplatting:
    return DECODERS[getattr(cfg, "name", "splatting")](cfg)


__all__ = [
    "DECODERS",
    "get_decoder",
    "DecoderSplatting",
    "DecoderSplattingCfg",
    "DecoderOutput",
    "DepthRenderingMode",
]
