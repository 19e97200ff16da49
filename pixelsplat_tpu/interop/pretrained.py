"""Pretrained-backbone initialization from exported torch.hub weights.

The reference initializes its backbones from torch.hub DINO weights at
construction (/root/reference/src/model/encoder/backbone/
backbone_resnet.py:43, backbone_dino.py:21-40: `dino_resnet50` and the
DINO ViT are pretrained; plain torchvision resnets and all pixelSplat
heads start random). This module reproduces that recipe for from-scratch
training: `tools/export_dino_weights.py` saves the raw hub state_dicts
as npz (one-time, needs egress), and `init_backbone_from_pretrained`
grafts the converted trunks into a freshly initialized parameter tree —
projection heads and token MLPs keep their random init, exactly as in
the reference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Optional

import numpy as np

WEIGHTS_DIR = Path(__file__).resolve().parents[2] / "weights"


def save_state_dict_npz(sd: Mapping, path: Path) -> None:
    """Save a (numpy-valued) torch state_dict as npz (keys keep dots)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in sd.items()})


def load_state_dict_npz(path: Path) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _hub_vit_path(model: str) -> Path:
    return WEIGHTS_DIR / f"{model}.npz"


def _hub_resnet_path() -> Path:
    return WEIGHTS_DIR / "dino_resnet50.npz"


def pretrained_backbone_params(cfg) -> Optional[dict]:
    """Converted pretrained sub-trees for the given backbone cfg, or None
    when the exported weights are not on disk.

    Returns a partial parameter tree shaped like the encoder's
    `backbone` collection: only the leaves that are pretrained in the
    reference recipe are present.
    """
    from ..model.encoder.backbone.dino import VIT_SPECS, BackboneDinoCfg
    from ..model.encoder.backbone.resnet import BackboneResnetCfg
    from .torch_import import convert_dino_vit, convert_resnet

    def resnet_trunk() -> Optional[dict]:
        path = _hub_resnet_path()
        if not path.exists():
            return None
        sd = {f"hub.model.{k}": v for k, v in load_state_dict_npz(path).items()}
        return convert_resnet(
            sd, "hub", "dino_resnet50", 4, include_projections=False
        )

    if isinstance(cfg, BackboneDinoCfg):
        vit_path = _hub_vit_path(cfg.model)
        if not vit_path.exists():
            return None
        spec = VIT_SPECS[cfg.model]
        sd = {f"hub.{k}": v for k, v in load_state_dict_npz(vit_path).items()}
        out = {
            "dino": convert_dino_vit(
                sd, "hub", spec["depth"], spec["dim"], spec["heads"]
            )
        }
        trunk = resnet_trunk()
        if trunk is not None:
            out["resnet_backbone"] = trunk
        return out

    if isinstance(cfg, BackboneResnetCfg) and cfg.model == "dino_resnet50":
        return resnet_trunk()
    # Plain torchvision resnets are randomly initialized in the reference.
    return None


def _graft(dst: dict, src: dict, path: str = "") -> list[str]:
    grafted = []
    for k, v in src.items():
        here = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            if k not in dst:
                raise KeyError(f"pretrained subtree {here} not in params")
            grafted += _graft(dst[k], v, here)
        else:
            import jax.numpy as jnp

            if k not in dst:
                raise KeyError(f"pretrained leaf {here} not in params")
            if tuple(dst[k].shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {here}: params {dst[k].shape} vs "
                    f"pretrained {np.shape(v)}"
                )
            dst[k] = jnp.asarray(v, dst[k].dtype)
            grafted.append(here)
    return grafted


def init_backbone_from_pretrained(variables: dict, encoder_cfg) -> tuple[dict, int]:
    """Graft pretrained backbone trunks into freshly initialized encoder
    variables (in the {"params": {...}} layout). Returns the updated
    variables and the number of grafted leaves (0 = no weights on disk).
    """
    import jax

    pre = pretrained_backbone_params(encoder_cfg.backbone)
    if pre is None:
        return variables, 0
    variables = jax.tree.map(lambda x: x, variables)  # shallow-safe copy
    grafted = _graft(variables["params"]["backbone"], pre)
    return variables, len(grafted)
