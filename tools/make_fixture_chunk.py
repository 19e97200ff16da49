"""Generate the checked-in RE10K fixture chunk (tests/fixtures/re10k).

The real RE10K chunks (consumed by /root/reference/src/dataset/
dataset_re10k.py:87-128) are torch-saved lists of per-scene dicts with the
full key layout produced by the upstream preprocessing pipeline:

    {"url": str,
     "timestamps": int64 tensor (n,),
     "cameras": float32 tensor (n, 18),
     "images": [uint8 1-D tensors of JPEG bytes, ...],
     "key": str}

plus a sibling index.json mapping scene key -> chunk filename. This script
writes a byte-accurate facsimile of that layout (same container types, same
camera packing, real 360x640 JPEG frames, extra url/timestamps fields the
readers must tolerate) with deterministic content, so the dataset reader /
native transcoder / evaluation plumbing are exercised against the genuine
byte layout rather than the minimal subset our other tests synthesize.

Deterministic: re-running reproduces the same fixture bit-for-bit apart
from JPEG encoder versioning. Run from the repo root:

    python tools/make_fixture_chunk.py
"""

from __future__ import annotations

import io
import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
FIXTURE_ROOT = REPO / "tests" / "fixtures" / "re10k"

N_FRAMES = 8
RAW_H, RAW_W = 360, 640
SCENES = ("fixture_scene_a", "fixture_scene_b")


def _frame(rng: np.ndarray, scene_idx: int, t: float) -> np.ndarray:
    """A smooth synthetic photograph: gradient sky + colored discs that
    shift with the camera parameter t (content JPEG compresses well)."""
    y, x = np.mgrid[0:RAW_H, 0:RAW_W].astype(np.float32)
    img = np.zeros((RAW_H, RAW_W, 3), np.float32)
    img[..., 0] = 0.35 + 0.4 * y / RAW_H
    img[..., 1] = 0.45 + 0.3 * x / RAW_W
    img[..., 2] = 0.65 - 0.3 * y / RAW_H
    for k in range(5):
        cx = (0.15 + 0.18 * k) * RAW_W - 60.0 * t * (1 + 0.3 * k)
        cy = (0.3 + 0.12 * ((k * 2 + scene_idx) % 5)) * RAW_H
        r = 28.0 + 9.0 * k
        mask = ((x - cx) ** 2 + (y - cy) ** 2) < r * r
        color = np.array(
            [0.9 - 0.15 * k, 0.2 + 0.15 * k, 0.3 + 0.1 * ((k + scene_idx) % 3)],
            np.float32,
        )
        img[mask] = color
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _cameras(scene_idx: int) -> np.ndarray:
    """(n, 18) packed rows: fx fy cx cy 0 0 then w2c[:3,:4] row-major —
    the layout convert_poses unpacks (dataset_re10k.py in both repos)."""
    from scipy.spatial.transform import Rotation as R

    cams = np.zeros((N_FRAMES, 18), np.float32)
    fx = 0.92 + 0.02 * scene_idx
    cams[:, 0] = fx
    cams[:, 1] = fx * RAW_W / RAW_H  # square pixels
    cams[:, 2] = 0.5
    cams[:, 3] = 0.5
    for i in range(N_FRAMES):
        t = i / (N_FRAMES - 1)
        # A gentle arc: translate along x, bob in y, yaw a few degrees.
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R.from_euler(
            "yxz", [6.0 * t - 3.0, 1.5 * np.sin(t * np.pi), 0.0], degrees=True
        ).as_matrix()
        c2w[0, 3] = 0.55 * t
        c2w[1, 3] = 0.05 * np.sin(t * 2 * np.pi)
        c2w[2, 3] = 0.1 * t
        w2c = np.linalg.inv(c2w).astype(np.float32)
        cams[i, 6:] = w2c[:3].reshape(-1)
    return cams


def main() -> None:
    import torch
    from PIL import Image

    out = FIXTURE_ROOT / "test"
    out.mkdir(parents=True, exist_ok=True)

    chunk = []
    for s, scene in enumerate(SCENES):
        images = []
        for i in range(N_FRAMES):
            buf = io.BytesIO()
            Image.fromarray(_frame(None, s, i / (N_FRAMES - 1))).save(
                buf, format="JPEG", quality=88
            )
            images.append(
                torch.from_numpy(
                    np.frombuffer(buf.getvalue(), np.uint8).copy()
                )
            )
        chunk.append(
            {
                "url": f"https://www.youtube.com/watch?v=fixture{s}",
                "timestamps": torch.arange(N_FRAMES, dtype=torch.int64) * 33366,
                "cameras": torch.from_numpy(_cameras(s)),
                "images": images,
                "key": scene,
            }
        )
    torch.save(chunk, out / "000000.torch")
    json.dump(
        {scene: "000000.torch" for scene in SCENES},
        (out / "index.json").open("w"),
        indent=2,
    )

    # Evaluation index in the reference's published format
    # (/root/reference/assets/evaluation_index_re10k.json): scene ->
    # {context: [...], target: [...]} (null for skipped scenes).
    eval_index = {
        "fixture_scene_a": {"context": [0, 5], "target": [1, 3, 4]},
        "fixture_scene_b": {"context": [1, 6], "target": [2, 4, 5]},
    }
    json.dump(
        eval_index,
        (FIXTURE_ROOT.parent / "evaluation_index_fixture.json").open("w"),
        indent=2,
    )
    size = sum(f.stat().st_size for f in out.iterdir())
    print(f"fixture written to {out} ({size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
