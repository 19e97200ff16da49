"""Export DINO torch.hub backbone weights to weights/*.npz.

Run in an environment WITH network egress:
    python tools/export_dino_weights.py [dino_vitb8 ...]
Saves the raw hub state_dicts (weights/dino_vitb8.npz,
weights/dino_resnet50.npz); pixelsplat_tpu.interop.pretrained converts
them into Flax backbone trunks at init time. (This container has zero
egress, so the files ship separately.)

Reference: /root/reference/src/model/encoder/backbone/backbone_dino.py:25
(torch.hub.load("facebookresearch/dino:main", ...)).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import torch

    from pixelsplat_tpu.interop.pretrained import (
        WEIGHTS_DIR,
        save_state_dict_npz,
    )

    models = sys.argv[1:] or ["dino_vitb8"]
    for name in models + ["dino_resnet50"]:
        module = torch.hub.load("facebookresearch/dino:main", name)
        sd = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
        path = WEIGHTS_DIR / f"{name}.npz"
        save_state_dict_npz(sd, path)
        print(f"wrote {path} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
