"""Optimizer: Adam + linear LR warm-up + global-norm gradient clipping.

Mirrors the reference recipe (/root/reference/src/model/model_wrapper.py:
488-504 and config/main.yaml): Adam at cfg.lr with LR ramping linearly from
1/warm_up_steps to 1x over warm_up_steps, and Lightning's
gradient_clip_val=0.5 global-norm clip.
"""

from __future__ import annotations

from dataclasses import dataclass

import optax


@dataclass(frozen=True)
class OptimizerCfg:
    lr: float = 1.5e-4
    warm_up_steps: int = 2000


def build_optimizer(
    cfg: OptimizerCfg, gradient_clip_val: float = 0.5
) -> optax.GradientTransformation:
    def schedule(step):
        frac = optax.safe_increment(step) / max(cfg.warm_up_steps, 1)
        import jax.numpy as jnp

        return cfg.lr * jnp.minimum(1.0, frac)

    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    chain.append(optax.adam(schedule))
    return optax.chain(*chain)
