"""Expand an evaluation index so every in-between frame is a target.

Mirrors /root/reference/src/scripts/generate_video_evaluation_index.py.
Usage: python -m pixelsplat_tpu.scripts.generate_video_evaluation_index \
    [input_index.json] [output_index.json]
"""

from __future__ import annotations

import sys
from pathlib import Path

from ..evaluation.evaluation_index_generator import expand_to_video_index

INDEX_INPUT = Path("assets/evaluation_index_re10k.json")
INDEX_OUTPUT = Path("assets/evaluation_index_re10k_video.json")

if __name__ == "__main__":
    args = sys.argv[1:]
    src = Path(args[0]) if len(args) > 0 else INDEX_INPUT
    dst = Path(args[1]) if len(args) > 1 else INDEX_OUTPUT
    expand_to_video_index(src, dst)
    print(f"Wrote {dst}")
