"""Data pipeline tests with synthetic .torch chunks."""

import io
import json
from pathlib import Path

import numpy as np
import pytest

from pixelsplat_tpu.dataset import get_dataset
from pixelsplat_tpu.dataset.data_module import DataLoaderCfg, DataLoaderStageCfg, DataModule, collate
from pixelsplat_tpu.dataset.dataset_re10k import DatasetRE10kCfg
from pixelsplat_tpu.dataset.view_sampler import (
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluationCfg,
)
from pixelsplat_tpu.utils.step_tracker import StepTracker

N_FRAMES = 12
RAW_SHAPE = (360, 640)


def make_chunk(scene_names, rng):
    """Build a reference-format chunk: list of {key, cameras, images}."""
    import torch
    from PIL import Image

    chunk = []
    for name in scene_names:
        cameras = np.zeros((N_FRAMES, 18), np.float32)
        cameras[:, 0] = 0.9  # fx
        cameras[:, 1] = 1.6  # fy (normalized by h=360: ~square pixels)
        cameras[:, 2] = 0.5
        cameras[:, 3] = 0.5
        # w2c rows: identity rotation, translation moving along x.
        for i in range(N_FRAMES):
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = -0.1 * i
            cameras[i, 6:] = w2c[:3].reshape(-1)
        images = []
        for i in range(N_FRAMES):
            img = (rng.uniform(0, 255, (*RAW_SHAPE, 3))).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            images.append(torch.tensor(np.frombuffer(buf.getvalue(), np.uint8)))
        chunk.append({"key": name, "cameras": torch.tensor(cameras), "images": images})
    return chunk


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("re10k")
    rng = np.random.default_rng(0)
    for stage, scenes in [("train", ["a", "b"]), ("test", ["c", "d"])]:
        d = root / stage
        d.mkdir()
        chunk = make_chunk(scenes, rng)
        torch.save(chunk, d / "000000.torch")
        json.dump(
            {s: "000000.torch" for s in scenes}, (d / "index.json").open("w")
        )
    return root


def bounded_cfg(**kw):
    return ViewSamplerBoundedCfg(
        num_context_views=2,
        num_target_views=2,
        min_distance_between_context_views=3,
        max_distance_between_context_views=6,
        **kw,
    )


def test_train_iteration(data_root):
    cfg = DatasetRE10kCfg(
        image_shape=(64, 96),
        roots=(data_root,),
        view_sampler=bounded_cfg(),
    )
    ds = get_dataset(cfg, "train", StepTracker(), seed=0)
    ex = next(iter(ds))
    assert ex["context"]["image"].shape == (2, 3, 64, 96)
    assert ex["target"]["image"].shape == (2, 3, 64, 96)
    assert ex["context"]["extrinsics"].shape == (2, 4, 4)
    # Baseline-1: distance between context cameras must be 1.
    a, b = ex["context"]["extrinsics"][:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(a - b), 1.0, rtol=1e-5)
    # near/far rescaled by the same factor.
    assert ex["context"]["near"][0] > 0

    # Values in [0, 1].
    assert 0 <= ex["context"]["image"].min() and ex["context"]["image"].max() <= 1


def test_curriculum_schedule(data_root):
    tracker = StepTracker()
    cfg = DatasetRE10kCfg(
        image_shape=(64, 96),
        roots=(data_root,),
        view_sampler=bounded_cfg(
            warm_up_steps=100,
            initial_min_distance_between_context_views=2,
            initial_max_distance_between_context_views=2,
        ),
    )
    ds = get_dataset(cfg, "train", tracker, seed=0)
    # At step 0, gap must be the initial 2.
    ex = next(iter(ds))
    gap = ex["context"]["index"][1] - ex["context"]["index"][0]
    assert gap == 2
    # At the end of the warm-up, gap is in [3, 6].
    tracker.set_step(100)
    ex = next(iter(ds))
    gap = ex["context"]["index"][1] - ex["context"]["index"][0]
    assert 3 <= gap <= 6


def test_evaluation_sampler(data_root, tmp_path):
    index = {"c": {"context": [0, 5], "target": [1, 2, 3]}, "d": None}
    index_path = tmp_path / "eval_index.json"
    json.dump(index, index_path.open("w"))
    cfg = DatasetRE10kCfg(
        image_shape=(64, 96),
        roots=(data_root,),
        view_sampler=ViewSamplerEvaluationCfg(index_path=index_path),
    )
    ds = get_dataset(cfg, "test", None, seed=0)
    examples = list(ds)
    assert len(examples) == 1  # scene d has no index entry
    ex = examples[0]
    assert ex["scene"] == "c"
    np.testing.assert_array_equal(ex["context"]["index"], [0, 5])
    np.testing.assert_array_equal(ex["target"]["index"], [1, 2, 3])


def test_data_module_batching(data_root):
    cfg = DatasetRE10kCfg(
        image_shape=(64, 96),
        roots=(data_root,),
        view_sampler=bounded_cfg(),
    )
    dm = DataModule(
        cfg,
        DataLoaderCfg(train=DataLoaderStageCfg(batch_size=2, num_workers=0, seed=12)),
        StepTracker(),
    )
    batch = next(iter(dm.train_dataloader()))
    assert batch["context"]["image"].shape == (2, 2, 3, 64, 96)
    assert batch["target"]["image"].shape == (2, 2, 3, 64, 96)
    assert len(batch["scene"]) == 2


def test_data_shim(data_root):
    import jax.numpy as jnp

    from pixelsplat_tpu.model.encoder.data_shim import get_data_shim
    from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolarCfg

    cfg = DatasetRE10kCfg(
        image_shape=(66, 98),  # not divisible by 16
        roots=(data_root,),
        view_sampler=bounded_cfg(),
    )
    dm = DataModule(
        cfg,
        DataLoaderCfg(train=DataLoaderStageCfg(batch_size=1, num_workers=0, seed=5)),
        StepTracker(),
    )
    batch = next(iter(dm.train_dataloader()))
    batch = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else v
        )
        for k, v in batch.items()
    }
    shim = get_data_shim(EncoderEpipolarCfg())
    shimmed = shim(batch)
    _, _, _, h, w = shimmed["context"]["image"].shape
    assert h % 16 == 0 and w % 16 == 0
    # Bounds shim overrode near/far with baseline-derived values.
    assert float(shimmed["context"]["near"][0, 0]) != 0.1
    assert float(shimmed["context"]["far"][0, 0]) > float(
        shimmed["context"]["near"][0, 0]
    )
