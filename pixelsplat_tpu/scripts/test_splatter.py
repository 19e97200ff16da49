"""Rasterizer smoke test: render one hand-crafted Gaussian on a spin orbit.

Mirrors /root/reference/src/scripts/test_splatter.py: a single Gaussian
with hand-set degree-4 SH coefficients is rendered from a spinning camera;
the output frames visually verify splatting + SH rotation. Writes PNGs to
outputs/test_splatter.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.rasterizer import RenderSettings, render
from ..utils.image_io import save_image
from ..visualization.camera_trajectory.spin import generate_spin


def main(argv: list[str]) -> None:
    out_dir = Path(argv[0]) if argv else Path("outputs/test_splatter")
    num_frames = int(argv[1]) if len(argv) > 1 else 12

    # One Gaussian at the origin with an anisotropic covariance and SH
    # coefficients that light different directions differently.
    means = jnp.zeros((1, 3))
    scale = jnp.asarray([0.4, 0.2, 0.1])
    covs = (jnp.diag(scale) ** 2)[None]
    opac = jnp.asarray([1.0])
    d_sh = 25
    sh = jnp.zeros((1, 3, d_sh))
    sh = sh.at[:, :, 0].set(jnp.asarray([0.6, 0.2, 0.2]))  # reddish DC
    sh = sh.at[:, 0, 3].set(0.8)  # x-dependent red
    sh = sh.at[:, 2, 1].set(0.8)  # y-dependent blue
    sh = sh.at[:, 1, 6].set(0.5)  # degree-2 green

    cameras = generate_spin(num_frames, elevation=20.0, radius=3.0)
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    settings = RenderSettings(capacity=16, big_capacity=4, chunk=16)

    for i, c2w in enumerate(cameras):
        img = render(
            jnp.asarray(np.linalg.inv(np.linalg.inv(c2w)))[None],  # c2w
            intr[None],
            jnp.ones(1) * 0.5,
            jnp.full((1,), 50.0),
            (256, 256),
            jnp.zeros((1, 3)),
            means[None],
            covs[None],
            sh[None],
            opac[None],
            settings=settings,
        )
        save_image(np.asarray(img[0]), out_dir / f"frame_{i:0>3}.png")
    print(f"Wrote {num_frames} frames to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
