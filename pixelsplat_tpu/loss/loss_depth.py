"""Edge-aware depth smoothness loss.

Mirrors /root/reference/src/loss/loss_depth.py: penalizes the second-moment
of 1/depth spatial differences (optionally second derivative), optionally
weighted by image-gradient bilateral weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LossDepthCfg:
    name: str = "depth"
    weight: float = 0.25
    sigma_image: Optional[float] = None
    use_second_derivative: bool = False


class LossDepth:
    name = "depth"

    def __init__(self, cfg: LossDepthCfg):
        self.cfg = cfg

    def __call__(self, prediction, batch, gaussians, global_step) -> jax.Array:
        assert prediction.depth is not None, "depth loss requires depth_mode"
        # Scale-invariant: operate on disparity.
        disp = 1.0 / prediction.depth  # (b, v, h, w)

        # First (optionally second) spatial differences.
        dx = disp[..., :, 1:] - disp[..., :, :-1]
        dy = disp[..., 1:, :] - disp[..., :-1, :]
        if self.cfg.use_second_derivative:
            dx = dx[..., :, 1:] - dx[..., :, :-1]
            dy = dy[..., 1:, :] - dy[..., :-1, :]

        if self.cfg.sigma_image is not None:
            image = batch["target"]["image"]  # (b, v, 3, h, w)
            gx = (image[..., :, 1:] - image[..., :, :-1]).mean(axis=2)
            gy = (image[..., 1:, :] - image[..., :-1, :]).mean(axis=2)
            if self.cfg.use_second_derivative:
                gx = gx[..., :, 1:]
                gy = gy[..., 1:, :]
            dx = dx * jnp.exp(-(gx**2) / (2 * self.cfg.sigma_image**2))
            dy = dy * jnp.exp(-(gy**2) / (2 * self.cfg.sigma_image**2))

        return self.cfg.weight * (jnp.mean(dx**2) + jnp.mean(dy**2))
