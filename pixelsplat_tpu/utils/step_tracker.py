"""Global-step channel from the trainer to data-pipeline workers.

Mirrors /root/reference/src/misc/step_tracker.py: a lock-protected shared
int64 so DataLoader worker *processes* observe the trainer's step (drives
the view-sampler curriculum).
"""

from __future__ import annotations

import multiprocessing as mp


class StepTracker:
    def __init__(self, initial_step: int = 0):
        self._value = mp.Value("q", initial_step)  # int64 + built-in lock

    def set_step(self, step: int) -> None:
        with self._value.get_lock():
            self._value.value = int(step)

    def get_step(self) -> int:
        with self._value.get_lock():
            return int(self._value.value)
