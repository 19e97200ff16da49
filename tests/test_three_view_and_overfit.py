"""3-context-view path coverage + end-to-end learning (overfit) test."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pixelsplat_tpu.model.decoder.decoder_splatting import (
    DecoderSplatting,
    DecoderSplattingCfg,
)
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
from pixelsplat_tpu.ops.rasterizer import RenderSettings

# Multi-minute e2e compiles: excluded from the CI-speed suite
# (python -m pytest -m 'not slow').
pytestmark = pytest.mark.slow


def tiny_cfg(num_context_views=2, **overrides):
    base = dict(
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
        gaussians_per_pixel=2,
        num_context_views=num_context_views,
    )
    base.update(overrides)
    return EncoderEpipolarCfg(**base)


def make_context(v, h=32, w=32, key=None, smooth=False):
    if key is None:
        key = jax.random.PRNGKey(0)
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (1, v, 3, 3)
    )
    extr = jnp.broadcast_to(jnp.eye(4), (1, v, 4, 4))
    extr = extr.at[:, :, 0, 3].set(jnp.linspace(0, 1, v))
    if smooth:
        # Low-frequency images a Gaussian-splat representation can actually
        # reproduce (per-pixel noise cannot be overfit by smooth splats).
        ys = jnp.linspace(0, 1, h)[:, None]
        xs = jnp.linspace(0, 1, w)[None, :]
        chans = [
            jnp.broadcast_to(0.5 + 0.5 * jnp.sin(2 * jnp.pi * (xs + ys)), (h, w)),
            jnp.broadcast_to(0.5 + 0.5 * jnp.cos(2 * jnp.pi * xs), (h, w)),
            jnp.broadcast_to(ys, (h, w)),
        ]
        img = jnp.stack(chans)[None, None]
        image = jnp.broadcast_to(img, (1, v, 3, h, w))
    else:
        image = jax.random.uniform(key, (1, v, 3, h, w))
    return {
        "image": image,
        "extrinsics": extr,
        "intrinsics": intr,
        "near": jnp.ones((1, v)),
        "far": jnp.full((1, v), 100.0),
    }


def test_three_context_views():
    """The 3-view configuration (BASELINE config #4): heterogeneous pairing
    over v=3, shuffled view embeddings, correct gaussian count."""
    cfg = tiny_cfg(num_context_views=3)
    encoder = EncoderEpipolar(cfg)
    context = make_context(3)
    params = encoder.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        context,
        jnp.asarray(0),
        True,
    )
    # Stochastic (training) path exercises the view-embedding shuffle.
    gs = encoder.apply(
        params, context, jnp.asarray(0), False, rngs={"sample": jax.random.PRNGKey(3)}
    )
    g = 3 * 32 * 32 * cfg.gaussians_per_pixel
    assert gs.means.shape == (1, g, 3)
    assert bool(jnp.isfinite(gs.means).all())
    # View embedding parameters exist for 3 views.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("view_embeddings" in n for n in names)


@pytest.mark.slow
def test_overfit_single_scene():
    """Training must actually learn: overfit one synthetic scene and check
    the rendered PSNR improves substantially."""
    cfg = tiny_cfg(use_epipolar_transformer=False, gaussians_per_pixel=1)
    encoder = EncoderEpipolar(cfg)
    decoder = DecoderSplatting(
        DecoderSplattingCfg(render=RenderSettings(capacity=256, big_capacity=16, chunk=64))
    )
    key = jax.random.PRNGKey(0)
    context = make_context(2, key=key, smooth=True)

    # Target = one of the context views seen from its own camera: the model
    # can drive the loss low by placing correctly colored Gaussians.
    target = {
        "image": context["image"][:, :1],
        "extrinsics": context["extrinsics"][:, :1],
        "intrinsics": context["intrinsics"][:, :1],
        "near": context["near"][:, :1],
        "far": context["far"][:, :1],
    }

    params = encoder.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        context,
        jnp.asarray(0),
        True,
    )
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        gs = encoder.apply(p, context, jnp.asarray(0), True)
        out = decoder(
            gs,
            target["extrinsics"],
            target["intrinsics"],
            target["near"],
            target["far"],
            (32, 32),
        )
        return jnp.mean((out.color - target["image"]) ** 2)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(120):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    psnr0 = -10 * np.log10(losses[0])
    psnr1 = -10 * np.log10(min(losses))
    assert np.isfinite(losses).all()
    assert psnr1 > psnr0 + 3.0, f"no learning: {psnr0:.2f} -> {psnr1:.2f} dB"
