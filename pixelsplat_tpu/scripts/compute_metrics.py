"""Offline metrics CLI: `python -m pixelsplat_tpu.scripts.compute_metrics
+evaluation=re10k [overrides...]`.

Mirrors /root/reference/src/scripts/compute_metrics.py: iterate the test
split with the evaluation view sampler, compute PSNR/LPIPS/SSIM for each
configured method's rendered frames against ground truth, dump JSON.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..config import _convert, compose_config, load_typed_root_config
from ..dataset.data_module import DataLoaderCfg, DataModule
from ..evaluation.evaluation_cfg import EvaluationCfg
from ..evaluation.metric_computer import MetricComputer


def main(argv: list[str]) -> None:
    # +evaluation=<name> loads config/evaluation/<name>.yaml as a global
    # overlay (matching the reference's hydra usage).
    overlays = [a for a in argv if a.startswith("+evaluation=")]
    rest = [a for a in argv if not a.startswith("+evaluation=")]
    cfg_dict = compose_config(rest, main_name="compute_metrics")
    import yaml

    from ..config import CONFIG_ROOT, _deep_merge, _load_yaml

    for overlay in overlays:
        name = overlay.split("=", 1)[1]
        data, _ = _load_yaml(CONFIG_ROOT / "evaluation" / f"{name}.yaml")
        data.pop("defaults", None)
        cfg_dict = _deep_merge(cfg_dict, data)

    evaluation_cfg = _convert(cfg_dict.pop("evaluation", {}), EvaluationCfg)
    output_metrics_path = Path(cfg_dict.pop("output_metrics_path", "metrics.json"))
    root = load_typed_root_config({k: v for k, v in cfg_dict.items() if k != "index_generator"})

    data_module = DataModule(root.dataset, root.data_loader)
    computer = MetricComputer(evaluation_cfg)
    if not computer.lpips_pretrained:
        print(
            "WARNING: LPIPS weights not found; LPIPS values use random weights "
            "and are NOT comparable to published numbers."
        )

    import numpy as np

    for batch in data_module.test_dataloader():
        scene = batch["scene"][0]
        computer.process_scene(
            scene,
            np.asarray(batch["target"]["image"][0]),
            np.asarray(batch["target"]["index"][0]).tolist(),
        )
        computer.print_preview()

    summary = computer.summary()
    output_metrics_path.parent.mkdir(exist_ok=True, parents=True)
    with output_metrics_path.open("w") as f:
        json.dump(summary, f)
    print(f"Wrote {output_metrics_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
