from .loss import Loss, LossCfg, get_losses
from .loss_depth import LossDepth, LossDepthCfg
from .loss_lpips import LossLpips, LossLpipsCfg
from .loss_mse import LossMse, LossMseCfg

__all__ = [
    "Loss",
    "LossCfg",
    "get_losses",
    "LossDepth",
    "LossDepthCfg",
    "LossLpips",
    "LossLpipsCfg",
    "LossMse",
    "LossMseCfg",
]
