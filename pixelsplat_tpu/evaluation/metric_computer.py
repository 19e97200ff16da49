"""Offline metric harness: compare methods' rendered PNGs against GT.

Mirrors /root/reference/src/evaluation/metric_computer.py: for each scene,
load each method's rendered frames, compute PSNR/LPIPS/SSIM against ground
truth, keep running averages, optionally export side-by-side comparisons.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.image_io import load_image, save_image
from ..visualization.annotation import add_label
from ..visualization.layout import add_border, hcat
from .evaluation_cfg import EvaluationCfg
from .lpips import compute_lpips, get_lpips_params
from .metrics import compute_psnr, compute_ssim


class MetricComputer:
    def __init__(self, cfg: EvaluationCfg):
        self.cfg = cfg
        self.scores: dict[str, dict[str, list[float]]] = {
            m.key: {"psnr": [], "lpips": [], "ssim": []} for m in cfg.methods
        }
        self.lpips_params, self.lpips_pretrained = get_lpips_params()

    def process_scene(self, scene: str, target_images: np.ndarray, indices: Iterable[int]):
        """target_images: (v, 3, h, w) ground truth for the target frames."""
        cfg = self.cfg
        indices = list(indices)

        # Make sure every method has rendered every frame.
        all_images = {}
        for method in cfg.methods:
            images = []
            for idx in indices:
                path = method.path / scene / f"color/{idx:0>6}.png"
                if not path.exists():
                    print(f'Skipping "{scene}" (missing {path}).')
                    return None
                images.append(load_image(path))
            all_images[method.key] = np.stack(images)

        gt = jnp.asarray(target_images)
        for method in cfg.methods:
            hat = jnp.asarray(all_images[method.key])
            self.scores[method.key]["psnr"].extend(
                np.asarray(compute_psnr(gt, hat)).tolist()
            )
            self.scores[method.key]["ssim"].extend(
                np.asarray(compute_ssim(gt, hat)).tolist()
            )
            self.scores[method.key]["lpips"].extend(
                np.asarray(compute_lpips(gt, hat, self.lpips_params)).tolist()
            )

        if cfg.side_by_side_path is not None:
            for i, idx in enumerate(indices):
                columns = [
                    add_label(target_images[i], "Ground Truth"),
                ] + [
                    add_label(all_images[m.key][i], m.name) for m in cfg.methods
                ]
                vis = add_border(hcat(*columns))
                save_image(vis, cfg.side_by_side_path / scene / f"{idx:0>6}.png")

        return {
            m.key: {k: float(np.mean(v)) for k, v in self.scores[m.key].items()}
            for m in cfg.methods
        }

    def print_preview(self) -> None:
        rows = []
        for method in self.cfg.methods:
            s = self.scores[method.key]
            rows.append(
                f"{method.name:>24} | "
                + " | ".join(
                    f"{k}: {np.mean(v):.3f}" if v else f"{k}: -"
                    for k, v in s.items()
                )
            )
        print("\n".join(rows))

    def summary(self) -> dict:
        return {
            m.key: {k: float(np.mean(v)) for k, v in self.scores[m.key].items() if v}
            for m in self.cfg.methods
        }
