"""Native (.psz / C++ / libjpeg) chunk loader round-trip tests."""

import io
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("torch")

from pixelsplat_tpu.native import NativeChunk, native_available

RAW = (48, 64)  # small raw frames for the test


@pytest.fixture(scope="module")
def psz_chunk(tmp_path_factory):
    import torch
    from PIL import Image

    if not native_available():
        pytest.skip("native chunk loader unavailable (no g++/libjpeg)")

    root = tmp_path_factory.mktemp("chunks")
    rng = np.random.default_rng(0)
    chunk = []
    frames_per_scene = [5, 3]
    originals = {}
    for s, n in enumerate(frames_per_scene):
        key = f"scene{s}"
        cameras = rng.normal(size=(n, 18)).astype(np.float32)
        images = []
        raw_frames = []
        for _ in range(n):
            img = (rng.uniform(0, 255, (*RAW, 3))).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=95)
            blob = np.frombuffer(buf.getvalue(), np.uint8)
            images.append(torch.tensor(blob))
            raw_frames.append(np.asarray(Image.open(io.BytesIO(blob.tobytes()))))
        chunk.append(
            {"key": key, "cameras": torch.tensor(cameras), "images": images}
        )
        originals[key] = (cameras, raw_frames)
    torch_path = root / "000000.torch"
    torch.save(chunk, torch_path)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.transcode_chunks import transcode

    psz_path = torch_path.with_suffix(".psz")
    transcode(torch_path, psz_path)
    return psz_path, originals


def test_native_roundtrip(psz_chunk):
    psz_path, originals = psz_chunk
    chunk = NativeChunk(psz_path, raw_shape=RAW)
    assert len(chunk) == 2
    for i, key in enumerate(["scene0", "scene1"]):
        assert chunk.key(i) == key
        cameras, frames = originals[key]
        assert chunk.num_frames(i) == len(frames)
        np.testing.assert_allclose(chunk.poses(i), cameras, rtol=1e-6)
        decoded = chunk.decode_frames(i, list(range(len(frames))), n_threads=2)
        for j, ref in enumerate(frames):
            # The C++ decode must match PIL's libjpeg decode bit-for-bit
            # (same underlying library) or at worst off-by-one rounding.
            diff = np.abs(decoded[j].astype(int) - ref.astype(int))
            assert diff.max() <= 1
    chunk.close()


def test_native_subset_and_errors(psz_chunk):
    psz_path, originals = psz_chunk
    chunk = NativeChunk(psz_path, raw_shape=RAW)
    # Subset decoding in arbitrary order.
    out = chunk.decode_frames(0, [2, 0], n_threads=1)
    assert out.shape == (2, *RAW, 3)
    # Out-of-range frame index raises.
    with pytest.raises(ValueError):
        chunk.decode_frames(0, [99])
    # Wrong expected shape raises.
    bad = NativeChunk(psz_path, raw_shape=(8, 8))
    with pytest.raises(ValueError):
        bad.decode_frames(0, [0])
    chunk.close()
    bad.close()
