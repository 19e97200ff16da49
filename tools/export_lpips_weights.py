"""Export LPIPS (VGG) pretrained weights to weights/lpips_vgg.npz.

Run in an environment WITH network egress and the `lpips` package:
    python tools/export_lpips_weights.py
The resulting npz is read by pixelsplat_tpu.evaluation.lpips at runtime.
(This container has zero egress, so the file ships separately.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def main() -> None:
    import lpips  # requires pip install lpips (downloads VGG16 weights)

    model = lpips.LPIPS(net="vgg")
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from pixelsplat_tpu.interop.torch_import import convert_lpips

    params = convert_lpips(sd)["params"]
    out: dict[str, np.ndarray] = {}
    for i, conv in params["vgg"].items():
        out[f"vgg_{i}_kernel"] = conv["kernel"]
        out[f"vgg_{i}_bias"] = conv["bias"]
    for key, value in params.items():
        if key.startswith("lin"):
            out[f"{key}_kernel"] = value["kernel"]

    dest = Path(__file__).resolve().parents[1] / "weights" / "lpips_vgg.npz"
    dest.parent.mkdir(exist_ok=True, parents=True)
    np.savez(dest, **out)
    print(f"Wrote {dest}")


if __name__ == "__main__":
    main()
