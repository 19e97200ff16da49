"""Ablation image comparison figure.

Counterpart of /root/reference/src/paper/generate_ablation_image_comparison.py:
compares the full model against its ablations (no epipolar transformer,
no probabilistic sampling, ...) on the ablation evaluation split
(config/evaluation/ablation.yaml). Shares the grid CLI with
generate_image_comparison; pass one method=dir pair per ablation.

Usage:
  python -m pixelsplat_tpu.paper.generate_ablation_image_comparison \
      out.png gt=<gt> full=<dir> no_epipolar=<dir> -- scene1:idx ...
"""

from __future__ import annotations

import sys

from .generate_image_comparison import main

if __name__ == "__main__":
    main(sys.argv[1:])
