"""Config system tests: composition, overrides, experiments, typing."""

from pathlib import Path

import pytest

from pixelsplat_tpu.config import compose_config, load_typed_root_config
from pixelsplat_tpu.dataset.view_sampler import (
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluationCfg,
)
from pixelsplat_tpu.model.encoder.backbone.dino import BackboneDinoCfg
from pixelsplat_tpu.model.encoder.backbone.resnet import BackboneResnetCfg


def test_default_composition():
    root = load_typed_root_config(compose_config([]))
    assert root.dataset.name == "re10k"
    assert root.dataset.image_shape == (180, 320)
    assert isinstance(root.dataset.view_sampler, ViewSamplerBoundedCfg)
    # The dataset-specific view-sampler override applied the curriculum.
    assert root.dataset.view_sampler.max_distance_between_context_views == 45
    assert root.dataset.view_sampler.warm_up_steps == 150_000
    assert isinstance(root.model.encoder.backbone, BackboneResnetCfg)
    assert [l.name for l in root.loss] == ["mse"]
    assert root.optimizer.lr == pytest.approx(1.5e-4)
    assert root.trainer.gradient_clip_val == 0.5


def test_experiment_re10k():
    root = load_typed_root_config(compose_config(["+experiment=re10k"]))
    assert root.dataset.image_shape == (256, 256)
    assert isinstance(root.model.encoder.backbone, BackboneDinoCfg)
    assert root.model.encoder.backbone.model == "dino_vitb8"
    assert sorted(l.name for l in root.loss) == ["lpips", "mse"]
    assert root.data_loader.train.batch_size == 7
    assert root.trainer.max_steps == 300_001
    lpips = next(l for l in root.loss if l.name == "lpips")
    assert lpips.apply_after_step == 150_000
    assert lpips.weight == pytest.approx(0.05)


def test_cli_overrides():
    root = load_typed_root_config(
        compose_config(
            [
                "+experiment=re10k",
                "mode=test",
                "dataset/view_sampler=evaluation",
                "data_loader.train.batch_size=3",
                "checkpointing.load=ckpts/foo",
                "model.encoder.gaussians_per_pixel=1",
            ]
        )
    )
    assert root.mode == "test"
    assert isinstance(root.dataset.view_sampler, ViewSamplerEvaluationCfg)
    # Evaluation-specific config points at the published index.
    assert str(root.dataset.view_sampler.index_path).endswith(
        "evaluation_index_re10k.json"
    )
    assert root.data_loader.train.batch_size == 3
    assert root.checkpointing.load == "ckpts/foo"
    assert root.model.encoder.gaussians_per_pixel == 1


def test_ablation_experiments():
    root = load_typed_root_config(
        compose_config(["+experiment=re10k_ablation_no_epipolar_transformer"])
    )
    assert root.model.encoder.use_epipolar_transformer is False

    root = load_typed_root_config(compose_config(["+experiment=re10k_3_view"]))
    assert root.dataset.view_sampler.num_context_views == 3
    assert root.model.encoder.num_context_views == 3

    root = load_typed_root_config(compose_config(["+experiment=re10k_depth_loss"]))
    assert sorted(l.name for l in root.loss) == ["depth", "lpips", "mse"]
    assert root.train.depth_mode == "depth"

    root = load_typed_root_config(
        compose_config(["+experiment=re10k_ablation_no_probabilistic_sampling"])
    )
    assert root.model.encoder.gaussians_per_pixel == 1
    assert root.model.encoder.use_transmittance is True


def test_compute_metrics_config():
    cfg = compose_config([], main_name="compute_metrics")
    # The override entry selects the evaluation sampler.
    assert cfg["dataset"]["view_sampler"]["name"] == "evaluation"


def test_acid_experiment():
    root = load_typed_root_config(compose_config(["+experiment=acid"]))
    assert str(root.dataset.roots[0]).endswith("acid")
    assert root.dataset.image_shape == (256, 256)
