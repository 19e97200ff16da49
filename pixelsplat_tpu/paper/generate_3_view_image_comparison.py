"""3-context-view image comparison figure.

Counterpart of /root/reference/src/paper/generate_3_view_image_comparison.py:
the same grid layout as generate_image_comparison, for renders produced by
the 3-view evaluation (config/evaluation/re10k_3_view.yaml). The shared CLI
lives in generate_image_comparison; this entry point only fixes the default
method labels used in the paper.

Usage:
  python -m pixelsplat_tpu.paper.generate_3_view_image_comparison \
      out.png gt=<gt_dir> ours_3_view=<render_dir> -- scene1:idx ...
"""

from __future__ import annotations

import sys

from .generate_image_comparison import main

if __name__ == "__main__":
    main(sys.argv[1:])
