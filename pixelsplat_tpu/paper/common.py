"""Shared helpers for the paper figure generators.

Counterpart of /root/reference/src/paper/common.py — the reference embeds
base64 PNGs into SVG documents and measures them with inkscape; here the
SVG is written with a small dependency-free builder (no inkscape in the
image), and figures can equally be saved as PNG via utils.image_io.
"""

from __future__ import annotations

import base64
from io import BytesIO
from pathlib import Path

import numpy as np

MARGIN = 2


def to_uint8(image: np.ndarray) -> np.ndarray:
    """(3, h, w) float [0,1] -> (h, w, 3) uint8."""
    image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    return (image.transpose(1, 2, 0) * 255.0).round().astype(np.uint8)


def encode_image(image: np.ndarray, image_format: str = "png") -> str:
    """Encode a (3, h, w) float image as a data URI for SVG embedding."""
    from PIL import Image

    stream = BytesIO()
    Image.fromarray(to_uint8(image)).save(stream, image_format)
    data = base64.b64encode(stream.getvalue()).decode("ascii")
    return f"data:image/{image_format};base64,{data}"


class SvgFigure:
    """Minimal SVG document builder (images, lines, circles, text)."""

    def __init__(self, width: float, height: float):
        self.width = width
        self.height = height
        self._elements: list[str] = []

    def add_image(self, image: np.ndarray, x: float, y: float, w: float, h: float):
        uri = encode_image(image)
        self._elements.append(
            f'<image x="{x}" y="{y}" width="{w}" height="{h}" '
            f'xlink:href="{uri}"/>'
        )

    def add_line(self, x1, y1, x2, y2, color="#000", width=1.0):
        self._elements.append(
            f'<line x1="{x1}" y1="{y1}" x2="{x2}" y2="{y2}" '
            f'stroke="{color}" stroke-width="{width}"/>'
        )

    def add_circle(self, cx, cy, r, color="#000", fill="none"):
        self._elements.append(
            f'<circle cx="{cx}" cy="{cy}" r="{r}" stroke="{color}" fill="{fill}"/>'
        )

    def add_text(self, text, x, y, size=10, color="#000", anchor="start"):
        self._elements.append(
            f'<text x="{x}" y="{y}" font-size="{size}" fill="{color}" '
            f'text-anchor="{anchor}" font-family="sans-serif">{text}</text>'
        )

    def save(self, path: Path | str) -> None:
        body = "\n".join(self._elements)
        doc = (
            '<svg xmlns="http://www.w3.org/2000/svg" '
            'xmlns:xlink="http://www.w3.org/1999/xlink" '
            f'width="{self.width}" height="{self.height}" '
            f'viewBox="0 0 {self.width} {self.height}">\n{body}\n</svg>\n'
        )
        Path(path).write_text(doc)
