"""Validation wrapper: one (random-ish) example per validation pass.

Mirrors /root/reference/src/dataset/validation_wrapper.py.
"""

from __future__ import annotations

from typing import Callable, Iterator


class ValidationWrapper:
    def __init__(self, make_stream: Callable[[], Iterator[dict]], length: int):
        self.make_stream = make_stream
        self.length = length
        self._stream: Iterator[dict] | None = None

    def __len__(self) -> int:
        return self.length

    def __iter__(self) -> Iterator[dict]:
        if self._stream is None:
            self._stream = iter(self.make_stream())
        for _ in range(self.length):
            yield next(self._stream)
