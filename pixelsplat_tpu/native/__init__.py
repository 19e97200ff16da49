"""ctypes bindings for the native (C++/libjpeg) chunk loader.

Builds the shared library on first use (g++ -O3 -shared) and exposes a
`NativeChunk` wrapper. See chunk_loader.cpp for the .psz container format
and tools/transcode_chunks.py for producing it from reference .torch
chunks.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "chunk_loader.cpp"
_LIB = _DIR / "libchunk_loader.so"

_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> Path:
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB),
        "-ljpeg",
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build_library()
    lib = ctypes.CDLL(str(_LIB))
    lib.psz_open.restype = ctypes.c_void_p
    lib.psz_open.argtypes = [ctypes.c_char_p]
    lib.psz_close.argtypes = [ctypes.c_void_p]
    lib.psz_num_examples.restype = ctypes.c_int32
    lib.psz_num_examples.argtypes = [ctypes.c_void_p]
    lib.psz_num_frames.restype = ctypes.c_int32
    lib.psz_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.psz_key.restype = ctypes.c_int32
    lib.psz_key.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    lib.psz_poses.restype = ctypes.c_int32
    lib.psz_poses.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.psz_decode_frames.restype = ctypes.c_int32
    lib.psz_decode_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeChunk:
    """A memory-mapped .psz chunk with multithreaded JPEG decoding."""

    def __init__(self, path: Path, raw_shape: tuple[int, int] = (360, 640)):
        lib = _load()
        self._lib = lib
        self._handle = lib.psz_open(str(path).encode())
        if not self._handle:
            raise IOError(f"failed to open {path}")
        self.raw_shape = raw_shape

    def __len__(self) -> int:
        return self._lib.psz_num_examples(self._handle)

    def num_frames(self, example: int) -> int:
        return self._lib.psz_num_frames(self._handle, example)

    def key(self, example: int) -> str:
        buf = ctypes.create_string_buffer(256)
        self._lib.psz_key(self._handle, example, buf, 256)
        return buf.value.decode()

    def poses(self, example: int) -> np.ndarray:
        n = self.num_frames(example)
        out = np.empty((n, 18), np.float32)
        self._lib.psz_poses(
            self._handle, example, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def decode_frames(
        self, example: int, frame_indices: Sequence[int], n_threads: int = 4
    ) -> np.ndarray:
        """Returns (n, h, w, 3) uint8 RGB."""
        h, w = self.raw_shape
        idx = np.asarray(frame_indices, np.int32)
        out = np.empty((len(idx), h, w, 3), np.uint8)
        status = self._lib.psz_decode_frames(
            self._handle,
            example,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(idx),
            h,
            w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_threads,
        )
        if status != 0:
            raise ValueError(f"native decode failed with status {status}")
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.psz_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
