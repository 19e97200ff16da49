"""Epipolar sampling figures (ray + sample overlays).

Counterpart of /root/reference/src/paper/generate_sampling_figure.py and
generate_epipolar_sampling_figure.py: draw, for chosen pixels, the cast ray
in the source view and the sampled points along the epipolar segment in the
other view.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import get_world_rays, project_rays
from ..utils.image_io import save_image
from ..visualization.drawing.lines import draw_lines
from ..visualization.drawing.points import draw_points
from ..visualization.layout import add_border, hcat


def main(argv: list[str]) -> None:
    out = Path(argv[0]) if argv else Path("outputs/sampling_figure.png")
    num_samples = int(argv[1]) if len(argv) > 1 else 16

    h = w = 256
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cam_a = jnp.eye(4)
    cam_b = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.8, 0.05, -0.1]))
    left = np.full((3, h, w), 0.9, np.float32)
    right = np.full((3, h, w), 0.9, np.float32)

    rng = np.random.default_rng(0)
    colors = [(0.9, 0.2, 0.2), (0.2, 0.7, 0.2), (0.2, 0.3, 0.9)]
    for color in colors:
        xy = jnp.asarray(rng.uniform(0.25, 0.75, (1, 2)).astype(np.float32))
        origins, directions = get_world_rays(xy, cam_a, intr)
        seg = project_rays(origins, directions, cam_b[None], intr[None])
        if not bool(seg.overlaps_image[0]):
            continue
        left = np.asarray(
            draw_points(jnp.asarray(left), np.asarray(xy) * [w, h], color, 5.0)
        )
        t = (np.arange(num_samples) + 0.5) / num_samples
        xy_min = np.asarray(seg.xy_min[0])
        xy_max = np.asarray(seg.xy_max[0])
        samples = (xy_min[None] + t[:, None] * (xy_max - xy_min)[None]) * [w, h]
        right = np.asarray(
            draw_lines(
                jnp.asarray(right),
                (xy_min * [w, h])[None],
                (xy_max * [w, h])[None],
                tuple(0.5 + 0.5 * c for c in color),
                2.0,
            )
        )
        right = np.asarray(draw_points(jnp.asarray(right), samples, color, 3.0))

    save_image(add_border(hcat(left, right)), out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
