"""Encoder→decoder SoA bridge: the evaluation fast path must render the
same images as the public AoS path.

The bridge (encoder `pack_soa=True` → decoder SoA dispatch) changes only
layout and the internal Gaussian ORDER (SoA g-order is (v, srf, gpp, r);
AoS is (v, r, srf, gpp)); rendering is order-agnostic up to compositing
tie-breaks between equal quantized depths, so images must agree tightly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolar
from pixelsplat_tpu.model.decoder import get_decoder
from pixelsplat_tpu.model.decoder.decoder_splatting import DecoderSplattingCfg
from pixelsplat_tpu.ops.rasterizer import RenderSettings
from pixelsplat_tpu.ops.rasterizer.projection import GaussiansSoA

from test_three_view_and_overfit import make_context, tiny_cfg


def _setup(v=2, h=32, w=32):
    cfg = tiny_cfg()
    encoder = EncoderEpipolar(cfg)
    context = make_context(v, h, w, smooth=True)
    params = encoder.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        context,
        jnp.asarray(0),
        True,
    )
    decoder = get_decoder(
        DecoderSplattingCfg(
            render=RenderSettings(capacity=512, big_capacity=32, chunk=64)
        )
    )
    tv = 2
    t_extr = jnp.broadcast_to(jnp.eye(4), (1, tv, 4, 4)).at[:, :, 0, 3].set(
        jnp.linspace(0.2, 0.6, tv)[None]
    )
    t_intr = jnp.broadcast_to(context["intrinsics"][:, :1], (1, tv, 3, 3))
    t_near = jnp.ones((1, tv))
    t_far = jnp.full((1, tv), 100.0)
    return encoder, params, context, decoder, (t_extr, t_intr, t_near, t_far), (h, w)


def test_soa_bridge_matches_aos_render():
    encoder, params, context, decoder, cams, shape = _setup()
    rngs = {"sample": jax.random.PRNGKey(3)}

    g_aos = encoder.apply(params, context, jnp.asarray(0), False, rngs=rngs)
    g_soa = encoder.apply(
        params, context, jnp.asarray(0), False, rngs=rngs, pack_soa=True
    )
    assert isinstance(g_soa, GaussiansSoA)
    g = g_aos.means.shape[1]
    assert g_soa.mean_x.shape == (1, g)
    assert g_soa.cov.shape == (1, 6, g)
    # Sample-shared SH: (b, ch, d_sh, V, 1, R), repeated only at eval.
    assert g_soa.harmonics.shape[4] == 1
    assert (
        g_soa.harmonics.shape[3] * g_soa.harmonics.shape[5] * 2 == g
    )  # gpp=2 in tiny_cfg

    # The SoA planes are a permutation of the AoS set: sorted multisets of
    # means/opacities must agree.
    aos_mx = np.sort(np.asarray(g_aos.means[0, :, 0]))
    soa_mx = np.sort(np.asarray(g_soa.mean_x[0]))
    np.testing.assert_allclose(aos_mx, soa_mx, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.asarray(g_aos.opacities[0])),
        np.sort(np.asarray(g_soa.opacity[0])),
        rtol=1e-6,
        atol=1e-6,
    )

    out_aos = decoder(g_aos, *cams, shape)
    out_soa = decoder(g_soa, *cams, shape)
    a = np.asarray(out_aos.color)
    s = np.asarray(out_soa.color)
    assert np.isfinite(s).all()
    # Tie-breaks between equal quantized depths may differ; everything
    # else must match closely.
    assert np.abs(a - s).max() < 2e-3, np.abs(a - s).max()
    assert np.abs(a - s).mean() < 1e-5


def test_soa_bridge_deterministic_mode():
    encoder, params, context, decoder, cams, shape = _setup()
    rngs = {"sample": jax.random.PRNGKey(3)}
    g_soa = encoder.apply(
        params, context, jnp.asarray(0), True, rngs=rngs, pack_soa=True
    )
    out = decoder(g_soa, *cams, shape)
    assert np.isfinite(np.asarray(out.color)).all()
    # deterministic -> one sample per pixel, S axis = 1.
    v, one, r = g_soa.harmonics.shape[3:]
    assert one == 1
    assert v * r == g_soa.mean_x.shape[1]
