"""Transcode reference .torch chunks into the native .psz container.

Usage: PYTHONPATH=. python tools/transcode_chunks.py <dataset_root>/<stage>
Writes a .psz next to every .torch chunk (same stem). The dataset reader
prefers .psz when present (decoded by the C++ loader).
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

MAGIC = 0x5053505A
VERSION = 1


def transcode(torch_path: Path, out_path: Path) -> None:
    import torch

    chunk = torch.load(torch_path, map_location="cpu", weights_only=False)
    n = len(chunk)

    # Directory entries are fixed-size; compute offsets in a second pass.
    header_size = 12 + n * 16
    payloads = []
    for ex in chunk:
        key = ex["key"].encode()
        poses = np.ascontiguousarray(
            np.asarray(ex["cameras"], np.float32)
        )
        blobs = [np.asarray(im, np.uint8).tobytes() for im in ex["images"]]
        offsets = np.zeros(len(blobs) + 1, np.uint64)
        base = len(key) + poses.nbytes + offsets.nbytes
        acc = base
        for i, b in enumerate(blobs):
            offsets[i] = acc
            acc += len(b)
        offsets[len(blobs)] = acc
        payloads.append((key, poses, offsets, blobs, acc))

    with out_path.open("wb") as f:
        f.write(struct.pack("<III", MAGIC, VERSION, n))
        offset = header_size
        for key, poses, offsets, blobs, total in payloads:
            f.write(struct.pack("<QII", offset, len(key), poses.shape[0]))
            offset += total
        for key, poses, offsets, blobs, total in payloads:
            f.write(key)
            f.write(poses.tobytes())
            f.write(offsets.tobytes())
            for b in blobs:
                f.write(b)


def main(argv: list[str]) -> None:
    root = Path(argv[0])
    for torch_path in sorted(root.glob("*.torch")):
        out = torch_path.with_suffix(".psz")
        if out.exists():
            continue
        transcode(torch_path, out)
        print(f"{torch_path.name} -> {out.name}")


if __name__ == "__main__":
    main(sys.argv[1:])
