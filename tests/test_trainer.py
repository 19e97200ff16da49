"""End-to-end training-loop smoke test on synthetic data (CPU mesh)."""

import io
import json
from pathlib import Path

import numpy as np
import pytest

# Multi-minute e2e compiles: excluded from the CI-speed suite
# (python -m pytest -m 'not slow').
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    import torch
    from PIL import Image

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for stage in ["train", "test"]:
        d = root / stage
        d.mkdir()
        chunk = []
        for name in ["s1", "s2"]:
            n = 10
            cameras = np.zeros((n, 18), np.float32)
            cameras[:, 0] = 0.9
            cameras[:, 1] = 1.6
            cameras[:, 2] = 0.5
            cameras[:, 3] = 0.5
            for i in range(n):
                w2c = np.eye(4, dtype=np.float32)
                w2c[0, 3] = -0.12 * i
                cameras[i, 6:] = w2c[:3].reshape(-1)
            images = []
            for _ in range(n):
                img = rng.uniform(0, 255, (360, 640, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG")
                images.append(torch.tensor(np.frombuffer(buf.getvalue(), np.uint8)))
            chunk.append(
                {"key": f"{stage}_{name}", "cameras": torch.tensor(cameras), "images": images}
            )
        torch.save(chunk, d / "000000.torch")
        json.dump(
            {c["key"]: "000000.torch" for c in chunk}, (d / "index.json").open("w")
        )
    return root


def test_trainer_fit_and_test(tiny_setup, tmp_path):
    from pixelsplat_tpu.dataset.data_module import (
        DataLoaderCfg,
        DataLoaderStageCfg,
        DataModule,
    )
    from pixelsplat_tpu.dataset.dataset_re10k import DatasetRE10kCfg
    from pixelsplat_tpu.dataset.view_sampler import ViewSamplerBoundedCfg
    from pixelsplat_tpu.loss import LossMseCfg, get_losses
    from pixelsplat_tpu.model.decoder.decoder_splatting import (
        DecoderSplatting,
        DecoderSplattingCfg,
    )
    from pixelsplat_tpu.model.encoder.backbone.resnet import BackboneResnetCfg
    from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolarCfg
    from pixelsplat_tpu.model.encoder.epipolar.epipolar_transformer import (
        EpipolarTransformerCfg,
    )
    from pixelsplat_tpu.model.encoder.epipolar.image_self_attention import (
        ImageSelfAttentionCfg,
    )
    from pixelsplat_tpu.ops.rasterizer import RenderSettings
    from pixelsplat_tpu.training.model_wrapper import (
        CheckpointingCfg,
        ModelWrapper,
        TestCfg,
        TrainCfg,
    )
    from pixelsplat_tpu.training.optimizer import OptimizerCfg
    from pixelsplat_tpu.training.trainer import Trainer, TrainerCfg
    from pixelsplat_tpu.utils.step_tracker import StepTracker

    dataset_cfg = DatasetRE10kCfg(
        image_shape=(32, 32),
        roots=(tiny_setup,),
        view_sampler=ViewSamplerBoundedCfg(
            num_context_views=2,
            num_target_views=2,
            min_distance_between_context_views=3,
            max_distance_between_context_views=6,
        ),
        augment=False,
    )
    encoder_cfg = EncoderEpipolarCfg(
        d_feature=16,
        num_monocular_samples=8,
        backbone=BackboneResnetCfg(model="resnet18", num_layers=2, d_out=16),
        epipolar_transformer=EpipolarTransformerCfg(
            self_attention=ImageSelfAttentionCfg(
                patch_size=2, num_octaves=2, num_layers=1, num_heads=2,
                d_token=16, d_dot=16, d_mlp=16,
            ),
            num_octaves=2, num_layers=1, num_heads=2, num_samples=4,
            d_dot=16, d_mlp=16, downscale=2,
        ),
        gaussians_per_pixel=1,
    )
    step_tracker = StepTracker()
    dm = DataModule(
        dataset_cfg,
        DataLoaderCfg(
            train=DataLoaderStageCfg(batch_size=2, num_workers=0, seed=0),
            val=DataLoaderStageCfg(batch_size=1, num_workers=0, seed=1),
            test=DataLoaderStageCfg(batch_size=1, num_workers=0, seed=2),
        ),
        step_tracker,
    )
    wrapper = ModelWrapper(
        OptimizerCfg(lr=1e-3, warm_up_steps=5),
        TrainCfg(),
        TestCfg(output_path=tmp_path / "test_out"),
        encoder_cfg,
        DecoderSplatting(
            DecoderSplattingCfg(
                render=RenderSettings(capacity=128, big_capacity=16, chunk=64)
            )
        ),
        get_losses([LossMseCfg()]),
    )
    trainer = Trainer(
        TrainerCfg(max_steps=3, val_check_interval=2, log_every_n_steps=1),
        wrapper,
        dm,
        CheckpointingCfg(every_n_train_steps=2),
        tmp_path / "out",
        step_tracker=step_tracker,
    )
    state = trainer.fit()
    assert int(state.step) == 3
    # Curriculum channel was updated.
    assert step_tracker.get_step() == 3
    # Checkpoints were written (step 2 + final step 3).
    ckpts = sorted((tmp_path / "out" / "checkpoints").iterdir())
    assert len(ckpts) >= 2

    # Test protocol: renders PNGs + metrics for each scene.
    summary = trainer.test(state)
    assert summary["num_scenes"] == 2
    assert "psnr" in summary
    rendered = list((tmp_path / "test_out").rglob("*.png"))
    assert len(rendered) > 0

    # Resume from the checkpoint.
    trainer2 = Trainer(
        TrainerCfg(max_steps=4, val_check_interval=0, log_every_n_steps=10),
        wrapper,
        dm,
        CheckpointingCfg(every_n_train_steps=0),
        tmp_path / "out2",
        step_tracker=step_tracker,
    )
    state2 = trainer2.fit(resume_from=ckpts[-1])
    assert int(state2.step) == 4
