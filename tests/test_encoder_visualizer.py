"""Encoder visualizer at reference figure scope (VERDICT item 8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Compiles a full (tiny) encoder + many drawing jits: ~3 min on CPU.
pytestmark = pytest.mark.slow


def test_visualizer_emits_reference_figure_set():
    from pixelsplat_tpu.model.encoder.backbone.resnet import BackboneResnetCfg
    from pixelsplat_tpu.model.encoder.encoder_epipolar import (
        EncoderEpipolar,
        EncoderEpipolarCfg,
    )
    from pixelsplat_tpu.model.encoder.epipolar.epipolar_transformer import (
        EpipolarTransformerCfg,
    )
    from pixelsplat_tpu.model.encoder.epipolar.image_self_attention import (
        ImageSelfAttentionCfg,
    )
    from pixelsplat_tpu.model.encoder.visualization.encoder_visualizer_epipolar import (  # noqa: E501
        EncoderVisualizerEpipolar,
        EncoderVisualizerEpipolarCfg,
    )

    cfg = EncoderEpipolarCfg(
        d_feature=16,
        num_monocular_samples=4,
        backbone=BackboneResnetCfg(model="resnet18", num_layers=3, d_out=16),
        epipolar_transformer=EpipolarTransformerCfg(
            self_attention=ImageSelfAttentionCfg(
                patch_size=4,
                num_octaves=2,
                num_layers=1,
                num_heads=2,
                d_token=8,
                d_dot=8,
                d_mlp=16,
            ),
            num_octaves=2,
            num_layers=2,
            num_heads=2,
            num_samples=4,
            d_dot=8,
            d_mlp=16,
            downscale=2,
        ),
        gaussians_per_pixel=2,
    )
    encoder = EncoderEpipolar(cfg)
    h = w = 32
    rng = np.random.default_rng(0)
    extr = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    extr[0, 1, 0, 3] = 0.4
    context = {
        "image": jnp.asarray(rng.uniform(0, 1, (1, 2, 3, h, w)), jnp.float32),
        "extrinsics": jnp.asarray(extr),
        "intrinsics": jnp.asarray(
            np.tile(
                np.asarray(
                    [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32
                ),
                (1, 2, 1, 1),
            )
        ),
        "near": jnp.full((1, 2), 0.5),
        "far": jnp.full((1, 2), 100.0),
    }
    params = encoder.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        context,
        jnp.asarray(0),
        True,
    )

    visualizer = EncoderVisualizerEpipolar(
        EncoderVisualizerEpipolarCfg(num_samples=4), encoder, params
    )
    figures = visualizer.visualize(context, global_step=0)

    expected = {
        "epipolar_samples",
        "epipolar_color_samples",
        "overlaps",
        "attention",
        "probabilities",
        "depth",
        "gaussians",
        "gaussian_stats",
    }
    assert expected.issubset(figures.keys()), sorted(figures)
    for name, figure in figures.items():
        assert figure.ndim == 3 and figure.shape[0] == 3, (name, figure.shape)
        assert np.isfinite(figure).all(), name
        assert figure.min() >= -1e-6 and figure.max() <= 1.0 + 1e-6, (
            name,
            float(figure.min()),
            float(figure.max()),
        )
