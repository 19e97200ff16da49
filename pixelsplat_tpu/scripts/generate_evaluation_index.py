"""Evaluation index generation CLI.

Mirrors /root/reference/src/scripts/generate_evaluation_index.py: iterate
every scene with the all-frames view sampler and pick overlap-valid context
pairs + targets; write evaluation_index.json.
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import _convert, compose_config, load_typed_root_config
from ..dataset.data_module import DataModule
from ..evaluation.evaluation_index_generator import (
    EvaluationIndexGenerator,
    EvaluationIndexGeneratorCfg,
)


def main(argv: list[str]) -> None:
    cfg_dict = compose_config(argv, main_name="generate_evaluation_index")
    gen_cfg = _convert(cfg_dict.pop("index_generator", {}), EvaluationIndexGeneratorCfg)
    root = load_typed_root_config(cfg_dict)

    data_module = DataModule(root.dataset, root.data_loader)
    generator = EvaluationIndexGenerator(gen_cfg)

    h, w = root.dataset.image_shape
    for i, batch in enumerate(data_module.test_dataloader()):
        scene = batch["scene"][0]
        generator.process_scene(
            scene,
            np.asarray(batch["target"]["extrinsics"][0]),
            np.asarray(batch["target"]["intrinsics"][0]),
            (h, w),
        )
        if (i + 1) % 25 == 0:
            print(f"{i + 1} scenes processed")
    path = generator.save_index()
    print(f"Wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
