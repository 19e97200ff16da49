"""Loss framework (reference: /root/reference/src/loss/loss.py).

Each loss is keyed by its cfg's `name`; `get_losses` builds the configured
set. Losses are pure callables: (prediction, batch, gaussians, global_step)
→ scalar.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Protocol

import jax


@dataclass(frozen=True)
class LossCfg:
    name: str = ""
    weight: float = 1.0


class Loss(Protocol):
    cfg: Any
    name: str

    def __call__(
        self,
        prediction,  # DecoderOutput
        batch: dict,
        gaussians,
        global_step: jax.Array,
    ) -> jax.Array: ...


def get_losses(cfgs: list) -> list[Loss]:
    from .loss_depth import LossDepth, LossDepthCfg
    from .loss_lpips import LossLpips, LossLpipsCfg
    from .loss_mse import LossMse, LossMseCfg

    registry = {
        LossMseCfg: LossMse,
        LossLpipsCfg: LossLpips,
        LossDepthCfg: LossDepth,
    }
    by_name = {"mse": LossMse, "lpips": LossLpips, "depth": LossDepth}
    losses = []
    for cfg in cfgs:
        cls = registry.get(type(cfg)) or by_name[cfg.name]
        losses.append(cls(cfg))
    return losses
