"""Wall-clock benchmarker with JSON dump.

Mirrors /root/reference/src/misc/benchmarker.py. On the TPU the only
reliable sync is a host transfer, so `time()` accepts a `sync` pytree whose
first leaf is fetched before the clock stops.
"""

from __future__ import annotations

import json
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from time import time

import jax
import numpy as np


class Benchmarker:
    def __init__(self):
        self.execution_times: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        try:
            start_time = time()
            yield
        finally:
            end_time = time()
            for _ in range(num_calls):
                self.execution_times[tag].append((end_time - start_time) / num_calls)

    def sync(self, value) -> None:
        """Force device completion by fetching one leaf to host."""
        leaves = jax.tree.leaves(value)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(dict(self.execution_times), f)

    def dump_memory(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        try:
            stats = dict(jax.local_devices()[0].memory_stats() or {})
        except Exception:
            pass
        with path.open("w") as f:
            json.dump({k: int(v) for k, v in stats.items()}, f)

    def summarize(self) -> dict[str, float]:
        return {
            tag: float(np.mean(times)) for tag, times in self.execution_times.items()
        }

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
