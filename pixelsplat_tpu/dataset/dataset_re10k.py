"""RE10K / ACID chunked-dataset reader.

Mirrors /root/reference/src/dataset/dataset_re10k.py: iterates .torch chunk
files (~100 MB, a torch-saved list of {key, cameras (n, 18), images:
[jpeg-bytes]}) listed by root/<stage>/index.json; decodes 18-float poses
into normalized intrinsics + OpenCV c2w extrinsics; applies the view
sampler, FOV/shape/baseline validity filters, baseline-1 world rescale, and
host-side augmentation/crop shims. ACID ships in the same format (only the
roots differ), so this one reader covers both datasets.

Outputs numpy examples; batching/device transfer happen in the DataModule.
torch is used ONLY to deserialize the chunk container format on CPU.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import cached_property
from io import BytesIO
from pathlib import Path
from typing import Iterator, Literal, Optional

import numpy as np
from PIL import Image

from .dataset import DatasetCfgCommon
from .shims.augmentation_shim import apply_augmentation_shim
from .shims.crop_shim import apply_crop_shim
from .types import Stage
from .view_sampler import ViewSampler


@dataclass(frozen=True)
class DatasetRE10kCfg(DatasetCfgCommon):
    name: Literal["re10k"] = "re10k"
    roots: tuple[Path, ...] = ()
    baseline_epsilon: float = 1e-3
    max_fov: float = 100.0
    make_baseline_1: bool = True
    augment: bool = True


def _fov_degrees(intrinsics: np.ndarray) -> np.ndarray:
    """Field of view (degrees) per view from normalized intrinsics."""
    inv = np.linalg.inv(intrinsics)

    def angle(a, b):
        va = inv @ np.asarray(a, np.float32)
        vb = inv @ np.asarray(b, np.float32)
        va /= np.linalg.norm(va, axis=-1, keepdims=True)
        vb /= np.linalg.norm(vb, axis=-1, keepdims=True)
        return np.degrees(np.arccos(np.clip((va * vb).sum(-1), -1, 1)))

    fov_x = angle([0, 0.5, 1], [1, 0.5, 1])
    fov_y = angle([0.5, 0, 1], [0.5, 1, 1])
    return np.stack([fov_x, fov_y], axis=-1)


class DatasetRE10k:
    near: float = 0.1
    far: float = 1000.0

    def __init__(
        self,
        cfg: DatasetRE10kCfg,
        stage: Stage,
        view_sampler: ViewSampler,
        seed: int = 0,
        worker_id: int = 0,
        num_workers: int = 1,
    ) -> None:
        self.cfg = cfg
        self.stage = stage
        self.view_sampler = view_sampler
        self.rng = np.random.default_rng(seed + worker_id)
        self.worker_id = worker_id
        self.num_workers = num_workers

        self.chunks: list[Path] = []
        for root in cfg.roots:
            root = Path(root) / self.data_stage
            self.chunks.extend(
                sorted(p for p in root.iterdir() if p.suffix == ".torch")
            )
        if self.cfg.overfit_to_scene is not None:
            chunk_path = self.index[self.cfg.overfit_to_scene]
            self.chunks = [chunk_path] * len(self.chunks)

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        chunks = list(self.chunks)
        if self.stage in ("train", "val"):
            perm = self.rng.permutation(len(chunks))
            chunks = [chunks[i] for i in perm]
        if self.stage == "test" and self.num_workers > 1:
            chunks = [
                c for i, c in enumerate(chunks) if i % self.num_workers == self.worker_id
            ]

        for chunk_path in chunks:
            native = self._open_native(chunk_path)
            if native is not None:
                yield from self._iter_native(native)
                continue
            chunk = self._load_chunk(chunk_path)
            if self.cfg.overfit_to_scene is not None:
                item = [x for x in chunk if x["key"] == self.cfg.overfit_to_scene]
                assert len(item) == 1
                chunk = item * len(chunk)
            if self.stage in ("train", "val"):
                perm = self.rng.permutation(len(chunk))
                chunk = [chunk[i] for i in perm]

            for example in chunk:
                out = self._process_example(example)
                if out is not None:
                    yield out

    # ------------------------------------------------------------------
    def _load_chunk(self, path: Path) -> list[dict]:
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)

    def _open_native(self, chunk_path: Path):
        """Prefer the .psz sibling decoded by the C++ loader when present."""
        psz = chunk_path.with_suffix(".psz")
        if not psz.exists():
            return None
        try:
            from ..native import NativeChunk, native_available

            if not native_available():
                return None
            return NativeChunk(psz)
        except Exception:
            return None

    def _iter_native(self, native) -> Iterator[dict]:
        order = list(range(len(native)))
        if self.cfg.overfit_to_scene is not None:
            match = [i for i in order if native.key(i) == self.cfg.overfit_to_scene]
            order = match * len(order) if match else order
        if self.stage in ("train", "val"):
            order = [order[i] for i in self.rng.permutation(len(order))]
        for i in order:
            scene = native.key(i)
            extrinsics, intrinsics = self.convert_poses(native.poses(i))

            def get_images(indices, i=i):
                frames = native.decode_frames(i, [int(x) for x in indices])
                return frames.astype(np.float32).transpose(0, 3, 1, 2) / 255.0

            out = self._assemble(scene, extrinsics, intrinsics, get_images)
            if out is not None:
                yield out

    def _process_example(self, example: dict) -> Optional[dict]:
        cameras = np.asarray(example["cameras"], dtype=np.float32)
        extrinsics, intrinsics = self.convert_poses(cameras)
        scene = example["key"]

        def get_images(indices):
            return self.convert_images([example["images"][int(i)] for i in indices])

        return self._assemble(scene, extrinsics, intrinsics, get_images)

    def _assemble(self, scene, extrinsics, intrinsics, get_images) -> Optional[dict]:
        try:
            context_indices, target_indices = self.view_sampler.sample(
                scene, extrinsics, intrinsics, self.rng
            )
        except ValueError:
            return None  # not enough frames

        if (_fov_degrees(intrinsics) > self.cfg.max_fov).any():
            return None

        try:
            context_images = get_images(context_indices)
            target_images = get_images(target_indices)
        except (IndexError, ValueError):
            return None

        # Shape filter (raw chunks are 360x640).
        if context_images.shape[1:] != (3, 360, 640) or target_images.shape[1:] != (
            3,
            360,
            640,
        ):
            print(
                f"Skipped bad example {scene}. Context shape was "
                f"{context_images.shape} and target shape was {target_images.shape}."
            )
            return None

        # Baseline-1 world normalization.
        context_extrinsics = extrinsics[context_indices]
        if context_extrinsics.shape[0] == 2 and self.cfg.make_baseline_1:
            a, b = context_extrinsics[:, :3, 3]
            scale = float(np.linalg.norm(a - b))
            if scale < self.cfg.baseline_epsilon:
                print(f"Skipped {scene} because of insufficient baseline {scale:.6f}")
                return None
            extrinsics = extrinsics.copy()
            extrinsics[:, :3, 3] /= scale
        else:
            scale = 1.0

        def bound(value: float, n: int) -> np.ndarray:
            return np.full((n,), value / scale, dtype=np.float32)

        out = {
            "context": {
                "extrinsics": extrinsics[context_indices],
                "intrinsics": intrinsics[context_indices],
                "image": context_images,
                "near": bound(self.near, len(context_indices)),
                "far": bound(self.far, len(context_indices)),
                "index": np.asarray(context_indices, dtype=np.int64),
            },
            "target": {
                "extrinsics": extrinsics[target_indices],
                "intrinsics": intrinsics[target_indices],
                "image": target_images,
                "near": bound(self.near, len(target_indices)),
                "far": bound(self.far, len(target_indices)),
                "index": np.asarray(target_indices, dtype=np.int64),
            },
            "scene": scene,
        }
        if self.stage == "train" and self.cfg.augment:
            out = apply_augmentation_shim(out, self.rng)
        return apply_crop_shim(out, tuple(self.cfg.image_shape))

    # ------------------------------------------------------------------
    def convert_poses(self, poses: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """18-float rows -> (c2w extrinsics (n,4,4), normalized K (n,3,3))."""
        b = poses.shape[0]
        intrinsics = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
        fx, fy, cx, cy = poses[:, 0], poses[:, 1], poses[:, 2], poses[:, 3]
        intrinsics[:, 0, 0] = fx
        intrinsics[:, 1, 1] = fy
        intrinsics[:, 0, 2] = cx
        intrinsics[:, 1, 2] = cy

        w2c = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        w2c[:, :3] = poses[:, 6:].reshape(b, 3, 4)
        return np.linalg.inv(w2c), intrinsics

    def convert_images(self, images: list) -> np.ndarray:
        out = []
        for image in images:
            raw = np.asarray(image, dtype=np.uint8).tobytes()
            img = Image.open(BytesIO(raw))
            out.append(
                (np.asarray(img, dtype=np.float32) / 255.0).transpose(2, 0, 1)
            )
        return np.stack(out)

    # ------------------------------------------------------------------
    @property
    def data_stage(self) -> Stage:
        if self.cfg.overfit_to_scene is not None:
            return "test"
        if self.stage == "val":
            return "test"
        return self.stage

    @cached_property
    def index(self) -> dict[str, Path]:
        merged: dict[str, Path] = {}
        data_stages = [self.data_stage]
        if self.cfg.overfit_to_scene is not None:
            data_stages = ["test", "train"]
        for data_stage in data_stages:
            for root in self.cfg.roots:
                root = Path(root)
                with (root / data_stage / "index.json").open("r") as f:
                    index = json.load(f)
                index = {k: root / data_stage / v for k, v in index.items()}
                assert not (set(merged) & set(index))
                merged.update(index)
        return merged

    def __len__(self) -> int:
        return len(self.index)
