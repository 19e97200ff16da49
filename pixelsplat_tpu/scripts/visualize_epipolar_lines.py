"""Epipolar geometry smoke test: draw a random pixel's epipolar line.

Mirrors /root/reference/src/scripts/visualize_epipolar_lines.py: pick a
random pixel in view A, project its ray into view B, and draw the visible
segment over view B's image. Works on synthetic cameras when no dataset is
available. Writes PNGs to outputs/epipolar_lines.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry import get_world_rays, project_rays
from ..utils.image_io import save_image
from ..visualization.drawing.lines import draw_lines
from ..visualization.drawing.points import draw_points


def main(argv: list[str]) -> None:
    out_dir = Path(argv[0]) if argv else Path("outputs/epipolar_lines")
    rng = np.random.default_rng(0)

    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    cam_a = jnp.eye(4)
    cam_b = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 0.1, -0.2]))

    h = w = 256
    image_b = np.full((3, h, w), 0.25, np.float32)

    for i in range(4):
        xy = jnp.asarray(rng.uniform(0.2, 0.8, (1, 2)).astype(np.float32))
        origins, directions = get_world_rays(xy, cam_a, intr)
        seg = project_rays(origins, directions, cam_b[None], intr[None])
        if not bool(seg.overlaps_image[0]):
            print(f"pixel {np.asarray(xy)[0]} has no epipolar overlap; skipping")
            continue
        start = np.asarray(seg.xy_min[0]) * [w, h]
        end = np.asarray(seg.xy_max[0]) * [w, h]
        canvas = draw_lines(
            image_b, start[None], end[None], (0.2, 0.9, 0.2), 3.0, cap="round"
        )
        canvas = draw_points(canvas, start[None], (1.0, 0.2, 0.2), 5.0)
        save_image(canvas, out_dir / f"line_{i}.png")
    print(f"Wrote epipolar line visualizations to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
