"""Data module: builds per-stage batched iterators.

Counterpart of /root/reference/src/dataset/data_module.py (a Lightning
DataModule wrapping torch DataLoaders). Here each stage gets a numpy
batch iterator with optional multiprocessing workers (fork) feeding a
bounded queue — examples are produced on the host and shipped to the TPU
by the training loop (which owns device placement / sharding).

Worker seeding matches the reference scheme: seed + global_rank, and each
worker additionally offsets by its worker id (reference uses
worker_init_fn, data_module.py:43-55).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import threading
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

import numpy as np

from ..utils.step_tracker import StepTracker
from . import DatasetCfg, get_dataset
from .types import Stage
from .validation_wrapper import ValidationWrapper


@dataclass(frozen=True)
class DataLoaderStageCfg:
    batch_size: int = 1
    num_workers: int = 0
    persistent_workers: bool = False
    seed: Optional[int] = None


@dataclass(frozen=True)
class DataLoaderCfg:
    train: DataLoaderStageCfg = field(default_factory=DataLoaderStageCfg)
    test: DataLoaderStageCfg = field(default_factory=DataLoaderStageCfg)
    val: DataLoaderStageCfg = field(default_factory=DataLoaderStageCfg)


def collate(examples: list[dict]) -> dict:
    """Stack a list of nested dict examples into batched numpy arrays."""
    out: dict = {}
    first = examples[0]
    for key, value in first.items():
        if isinstance(value, dict):
            out[key] = collate([e[key] for e in examples])
        elif isinstance(value, np.ndarray):
            out[key] = np.stack([e[key] for e in examples])
        else:
            out[key] = [e[key] for e in examples]
    return out


def _worker_loop(dataset_factory, worker_id, num_workers, out_queue, stop_event):
    dataset = dataset_factory(worker_id, num_workers)
    while not stop_event.is_set():
        produced = False
        for example in dataset:
            if stop_event.is_set():
                return
            out_queue.put(example)
            produced = True
        if not produced:
            break  # empty dataset; avoid spinning
    out_queue.put(None)


class _MultiprocessIterable:
    """Round-robin-ish merged stream from N worker processes."""

    def __init__(self, dataset_factory, num_workers: int, repeat: bool):
        self.dataset_factory = dataset_factory
        self.num_workers = num_workers
        self.repeat = repeat

    def __iter__(self) -> Iterator[dict]:
        ctx = mp.get_context("fork")
        out_queue = ctx.Queue(maxsize=4 * self.num_workers)
        stop = ctx.Event()
        procs = [
            ctx.Process(
                target=_worker_loop,
                args=(self.dataset_factory, i, self.num_workers, out_queue, stop),
                daemon=True,
            )
            for i in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        finished = 0
        try:
            while finished < self.num_workers:
                item = out_queue.get()
                if item is None:
                    finished += 1
                    continue
                yield item
        finally:
            stop.set()
            for p in procs:
                p.terminate()
                p.join(timeout=1)


class DataModule:
    def __init__(
        self,
        dataset_cfg: DatasetCfg,
        data_loader_cfg: DataLoaderCfg,
        step_tracker: Optional[StepTracker] = None,
        global_rank: int = 0,
        world_size: int = 1,
    ) -> None:
        self.dataset_cfg = dataset_cfg
        self.data_loader_cfg = data_loader_cfg
        self.step_tracker = step_tracker
        self.global_rank = global_rank
        self.world_size = world_size

    def _seed(self, stage_cfg: DataLoaderStageCfg, fallback: int) -> int:
        base = stage_cfg.seed if stage_cfg.seed is not None else fallback
        return base + self.global_rank

    def _examples(self, stage: Stage, stage_cfg: DataLoaderStageCfg, repeat: bool):
        seed = self._seed(stage_cfg, 0)
        cfg = self.dataset_cfg
        step_tracker = self.step_tracker
        rank, world = self.global_rank, self.world_size

        def factory(worker_id: int, num_workers: int):
            # Workers live in a global (rank x local-worker) id space so
            # the test stage's chunk partitioning shards scenes across
            # HOSTS as well as workers — the DDP per-rank-data contract
            # (reference data_module.py:87 passes global_rank the same
            # way).
            return get_dataset(
                cfg,
                stage,
                step_tracker,
                seed=seed,
                worker_id=rank * num_workers + worker_id,
                num_workers=world * num_workers,
            )

        if stage_cfg.num_workers <= 0:
            def inline() -> Iterator[dict]:
                while True:
                    produced = False
                    for ex in factory(0, 1):
                        produced = True
                        yield ex
                    if not repeat or not produced:
                        return

            return inline()
        stream = iter(
            _MultiprocessIterable(factory, stage_cfg.num_workers, repeat)
        )
        if not repeat:
            return stream

        def cycled() -> Iterator[dict]:
            while True:
                yielded = False
                for ex in _MultiprocessIterable(
                    factory, stage_cfg.num_workers, repeat
                ):
                    yielded = True
                    yield ex
                if not yielded:
                    return

        return cycled()

    def _batched(self, examples: Iterator[dict], batch_size: int) -> Iterator[dict]:
        batch: list[dict] = []
        for ex in examples:
            batch.append(ex)
            if len(batch) == batch_size:
                yield collate(batch)
                batch = []

    def train_dataloader(self) -> Iterator[dict]:
        cfg = self.data_loader_cfg.train
        return self._batched(self._examples("train", cfg, repeat=True), cfg.batch_size)

    def val_dataloader(self) -> Iterator[dict]:
        cfg = self.data_loader_cfg.val
        return self._batched(
            iter(ValidationWrapper(lambda: self._examples("val", cfg, repeat=True), 1)),
            cfg.batch_size,
        )

    def test_dataloader(self) -> Iterator[dict]:
        cfg = self.data_loader_cfg.test
        return self._batched(self._examples("test", cfg, repeat=False), cfg.batch_size)
