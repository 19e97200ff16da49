"""Side-by-side image comparison figures.

Counterpart of /root/reference/src/paper/generate_image_comparison.py (and
its 3-view / ablation variants): for chosen (scene, target_index) pairs,
stack ground truth and each method's render into a labeled grid.

Usage:
  python -m pixelsplat_tpu.paper.generate_image_comparison \
      out.png gt=path/to/gt name1=path1 name2=path2 -- scene1:idx scene2:idx
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..utils.image_io import load_image, save_image
from ..visualization.annotation import add_label
from ..visualization.layout import add_border, hcat, vcat


def load_frame(root: Path, scene: str, index: int) -> np.ndarray:
    return load_image(root / scene / "color" / f"{index:0>6}.png")


def main(argv: list[str]) -> None:
    out = Path(argv[0])
    split = argv.index("--")
    methods = [a.partition("=") for a in argv[1:split]]
    scenes = [a.rsplit(":", 1) for a in argv[split + 1 :]]

    rows = []
    for scene, idx in scenes:
        idx = int(idx)
        cells = []
        for name, _, path in methods:
            img = load_frame(Path(path), scene, idx)
            cells.append(add_label(img, name))
        rows.append(hcat(*cells))
    figure = add_border(vcat(*rows, gap=16))
    save_image(figure, out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
