"""Colormaps on arrays (matplotlib-backed) + CIELab 2D colormap.

Mirrors /root/reference/src/visualization/color_map.py.
"""

from __future__ import annotations

import numpy as np
from matplotlib import cm


def apply_color_map(x: np.ndarray, color_map: str = "inferno") -> np.ndarray:
    """x (...,) in [0,1] -> (..., 3)."""
    cmap = cm.get_cmap(color_map)
    mapped = cmap(np.clip(np.asarray(x), 0.0, 1.0))[..., :3]
    return mapped.astype(np.float32)


def apply_color_map_to_image(image: np.ndarray, color_map: str = "inferno") -> np.ndarray:
    """image (..., h, w) -> (..., 3, h, w)."""
    mapped = apply_color_map(image, color_map)
    return np.moveaxis(mapped, -1, -3)


def apply_color_map_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """2D colormap in CIELab-ish space: x, y in [0,1] -> (..., 3) RGB."""
    x = np.clip(np.asarray(x, np.float32), 0, 1)
    y = np.clip(np.asarray(y, np.float32), 0, 1)
    # Simple Lab construction: L fixed, a from x, b from y.
    lab_l = np.full_like(x, 65.0)
    lab_a = (x * 2 - 1) * 80.0
    lab_b = (y * 2 - 1) * 80.0
    return _lab_to_rgb(np.stack([lab_l, lab_a, lab_b], axis=-1))


def _lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t**3
        return np.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    # D65 white point.
    x = finv(fx) * 0.95047
    y = finv(fy)
    z = finv(fz) * 1.08883
    xyz = np.stack([x, y, z], axis=-1)
    m = np.asarray(
        [
            [3.2404542, -1.5371385, -0.4985314],
            [-0.9692660, 1.8760108, 0.0415560],
            [0.0556434, -0.2040259, 1.0572252],
        ],
        np.float32,
    )
    rgb = xyz @ m.T
    rgb = np.where(
        rgb > 0.0031308, 1.055 * np.abs(rgb) ** (1 / 2.4) - 0.055, 12.92 * rgb
    )
    return np.clip(rgb, 0.0, 1.0).astype(np.float32)
