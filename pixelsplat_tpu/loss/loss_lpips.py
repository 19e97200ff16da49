"""LPIPS perceptual loss, gated off before `apply_after_step`.

Mirrors /root/reference/src/loss/loss_lpips.py. The gate is a `lax.cond`
on the traced global step: the train step stays a single compiled program
(the reference branches in Python per step instead), but steps before the
activation step skip the VGG forward/backward at runtime rather than
multiplying it by zero. LPIPS network weights are frozen constants, never
part of the gradient.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..evaluation.lpips import LPIPS, get_lpips_params


@dataclass(frozen=True)
class LossLpipsCfg:
    name: str = "lpips"
    weight: float = 0.05
    apply_after_step: int = 150_000
    # Dryrun/test escape hatch: permit architecture-correct random VGG
    # weights when the exported .npz is absent. NEVER set in a real
    # training config.
    allow_random_weights: bool = False


class LossLpips:
    name = "lpips"

    def __init__(self, cfg: LossLpipsCfg):
        self.cfg = cfg
        # Hard-fail: a training run configured with this loss would
        # otherwise silently optimize a random-VGG "perceptual" distance
        # from step `apply_after_step` on (reference loads the published
        # VGG-LPIPS weights unconditionally, loss_lpips.py:33-47).
        self.params, self.pretrained = get_lpips_params(
            allow_random=cfg.allow_random_weights
        )
        if not self.pretrained:
            print(
                "WARNING: LossLpips running with RANDOM VGG weights "
                "(allow_random_weights=True); not a parity-capable run."
            )

    def __call__(self, prediction, batch, gaussians, global_step) -> jax.Array:
        image = batch["target"]["image"]  # (b, v, 3, h, w)
        b, v, c, h, w = image.shape
        pred = prediction.color.reshape(b * v, c, h, w)
        target = image.reshape(b * v, c, h, w)

        def run_lpips(_):
            return LPIPS().apply(
                jax.lax.stop_gradient(self.params), pred, target
            ).mean()

        loss = jax.lax.cond(
            global_step >= self.cfg.apply_after_step,
            run_lpips,
            lambda _: jnp.zeros((), pred.dtype),
            operand=None,
        )
        return self.cfg.weight * loss
