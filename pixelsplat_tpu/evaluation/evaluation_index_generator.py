"""Evaluation index generator: pick context pairs by ray-overlap walking.

Mirrors /root/reference/src/evaluation/evaluation_index_generator.py: from
a random anchor frame, walk outward in both directions until the mutual
epipolar ray overlap falls into [min_overlap, max_overlap] and the frame
distance into [min_distance, max_distance]; pick a random valid partner and
`num_target_views` distinct random targets between the pair.

Overlap is computed on device in one batched `project_rays` call per
candidate (the reference loops per frame on GPU).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar_lines import project_rays
from ..geometry.projection import get_world_rays, sample_image_grid


@dataclass(frozen=True)
class EvaluationIndexGeneratorCfg:
    num_target_views: int = 3
    min_distance: int = 45
    max_distance: int = 135
    min_overlap: float = 0.6
    max_overlap: float = 1.0
    output_path: Path = Path("outputs/evaluation_index")
    save_previews: bool = False
    seed: int = 123


@dataclass(frozen=True)
class IndexEntry:
    context: tuple[int, int]
    target: tuple[int, ...]


def _overlap(extr_a, intr_a, extr_b, intr_b, grid) -> float:
    """Fraction of A's rays whose epipolar segments land inside B."""
    origins, directions = get_world_rays(grid, jnp.asarray(extr_a), jnp.asarray(intr_a))
    seg = project_rays(origins, directions, jnp.asarray(extr_b), jnp.asarray(intr_b))
    return float(seg.overlaps_image.mean())


class EvaluationIndexGenerator:
    def __init__(self, cfg: EvaluationIndexGeneratorCfg):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.index: dict[str, Optional[IndexEntry]] = {}

    def process_scene(
        self,
        scene: str,
        extrinsics: np.ndarray,  # (v, 4, 4)
        intrinsics: np.ndarray,  # (v, 3, 3)
        image_shape: tuple[int, int],
    ) -> None:
        cfg = self.cfg
        v = extrinsics.shape[0]
        h, w = image_shape
        grid, _ = sample_image_grid((h, w))
        grid = grid.reshape(-1, 2)

        for context_index in self.rng.permutation(v):
            valid: list[tuple[int, float, float]] = []
            for step in (1, -1):
                current = int(context_index) + step * cfg.min_distance
                while 0 <= current < v:
                    overlap_a = _overlap(
                        extrinsics[current],
                        intrinsics[current],
                        extrinsics[context_index],
                        intrinsics[context_index],
                        grid,
                    )
                    overlap_b = _overlap(
                        extrinsics[context_index],
                        intrinsics[context_index],
                        extrinsics[current],
                        intrinsics[current],
                        grid,
                    )
                    overlap = min(overlap_a, overlap_b)
                    delta = abs(current - int(context_index))
                    if cfg.min_overlap <= overlap <= cfg.max_overlap:
                        valid.append((current, overlap_a, overlap_b))
                    if overlap < cfg.min_overlap or delta > cfg.max_distance:
                        break
                    current += step

            if valid:
                chosen, _, _ = valid[int(self.rng.integers(len(valid)))]
                left = min(chosen, int(context_index))
                right = max(chosen, int(context_index))
                # Distinct random targets between the context frames.
                while True:
                    targets = self.rng.integers(
                        left, right + 1, size=cfg.num_target_views
                    )
                    if len(set(targets.tolist())) == cfg.num_target_views:
                        break
                self.index[scene] = IndexEntry(
                    context=(left, right), target=tuple(sorted(targets.tolist()))
                )
                return
        self.index[scene] = None

    def save_index(self) -> Path:
        out = Path(self.cfg.output_path)
        out.mkdir(exist_ok=True, parents=True)
        path = out / "evaluation_index.json"
        with path.open("w") as f:
            json.dump(
                {k: None if v is None else asdict(v) for k, v in self.index.items()},
                f,
            )
        return path


def expand_to_video_index(index_path: Path, output_path: Path) -> None:
    """All intermediate frames become targets (reference:
    src/scripts/generate_video_evaluation_index.py)."""
    with Path(index_path).open("r") as f:
        index_input = json.load(f)
    out = {}
    for scene, entry in index_input.items():
        if entry is None:
            out[scene] = None
            continue
        a, b = entry["context"]
        out[scene] = {"context": [a, b], "target": list(range(a, b + 1))}
    with Path(output_path).open("w") as f:
        json.dump(out, f)
