"""Mean-squared color error (reference: /root/reference/src/loss/loss_mse.py)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LossMseCfg:
    name: str = "mse"
    weight: float = 1.0


class LossMse:
    name = "mse"

    def __init__(self, cfg: LossMseCfg):
        self.cfg = cfg

    def __call__(self, prediction, batch, gaussians, global_step) -> jax.Array:
        delta = prediction.color - batch["target"]["image"]
        return self.cfg.weight * jnp.mean(delta * delta)
