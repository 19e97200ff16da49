"""Epipolar sampling SVG figure (paper-quality, vector markers).

Counterpart of /root/reference/src/paper/generate_epipolar_sampling_figure.py:
two views side by side; a query pixel marked in the left view, the epipolar
segment and evenly spaced sample markers drawn in the right view. The
reference builds an inkscape-measured SVG; here the dependency-free
SvgFigure from paper/common.py embeds the images and draws vector overlays.

Usage:
  python -m pixelsplat_tpu.paper.generate_epipolar_sampling_figure \
      [out.svg] [num_markers] [ray_x ray_y]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry import get_world_rays, project_rays
from .common import MARGIN, SvgFigure

FIGURE_WIDTH = 480.0
TEXT_SIZE = 10


def main(argv: list[str]) -> None:
    out = Path(argv[0]) if argv else Path("outputs/epipolar_sampling_figure.svg")
    num_markers = int(argv[1]) if len(argv) > 1 else 8
    ray_xy = (
        (float(argv[2]), float(argv[3])) if len(argv) > 3 else (0.35, 0.44)
    )

    h = w = 256
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cam_a = jnp.eye(4)
    cam_b = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.8, 0.05, -0.1]))
    # Placeholder scene content (flat gray); swap in dataset frames by
    # loading them with utils.image_io.load_image.
    left = np.full((3, h, w), 0.92, np.float32)
    right = np.full((3, h, w), 0.92, np.float32)

    xy = jnp.asarray([ray_xy], jnp.float32)
    origins, directions = get_world_rays(xy, cam_a, intr)
    seg = project_rays(origins, directions, cam_b[None], intr[None])

    img_w = (FIGURE_WIDTH - MARGIN) / 2
    img_h = img_w * h / w
    fig = SvgFigure(FIGURE_WIDTH, img_h + TEXT_SIZE + 2 * MARGIN)
    fig.add_image(left, 0, 0, img_w, img_h)
    fig.add_image(right, img_w + MARGIN, 0, img_w, img_h)

    # Query pixel in the left view.
    qx, qy = ray_xy[0] * img_w, ray_xy[1] * img_h
    fig.add_circle(qx, qy, 3.5, color="#d22", fill="#d22")

    if bool(seg.overlaps_image[0]):
        x0, y0 = np.asarray(seg.xy_min[0]) * [img_w, img_h]
        x1, y1 = np.asarray(seg.xy_max[0]) * [img_w, img_h]
        ox = img_w + MARGIN
        fig.add_line(ox + x0, y0, ox + x1, y1, color="#d22", width=1.5)
        t = (np.arange(num_markers) + 0.5) / num_markers
        for ti in t:
            mx, my = x0 + ti * (x1 - x0), y0 + ti * (y1 - y0)
            fig.add_circle(ox + mx, my, 2.5, color="#d22", fill="#fff")

    fig.add_text("reference view", MARGIN, img_h + TEXT_SIZE, size=TEXT_SIZE)
    fig.add_text(
        "epipolar samples", img_w + 2 * MARGIN, img_h + TEXT_SIZE, size=TEXT_SIZE
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.save(out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
