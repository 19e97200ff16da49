"""View-sharded rendering over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.model.decoder.decoder_splatting import (
    DecoderSplatting,
    DecoderSplattingCfg,
)
from pixelsplat_tpu.model.types import Gaussians
from pixelsplat_tpu.ops.rasterizer import RenderSettings
from pixelsplat_tpu.parallel.mesh import make_mesh
from pixelsplat_tpu.parallel.render import render_views_sharded


def _scene(b=1, g=64, v=5, key=None):
    key = key or 0
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    means = jax.random.uniform(ks[0], (b, g, 3), minval=-0.5, maxval=0.5)
    means = means.at[..., 2].add(3.0)
    cov = jnp.broadcast_to(jnp.eye(3) * 1e-3, (b, g, 3, 3))
    harmonics = jnp.zeros((b, g, 3, 25)).at[..., 0].set(
        jax.random.uniform(ks[1], (b, g, 3)) / 0.2821
    )
    opac = jax.random.uniform(ks[2], (b, g), minval=0.4, maxval=0.9)
    gaussians = Gaussians(means, cov, harmonics, opac)
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    extr = extr.at[:, :, 0, 3].set(jnp.linspace(-0.2, 0.2, v))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
    )
    near = jnp.ones((b, v))
    far = jnp.full((b, v), 100.0)
    return gaussians, extr, intr, near, far


def test_view_sharded_matches_single_device():
    """v=5 target views over an 8-device mesh (pads to 8, drops 3) must
    reproduce the plain decoder output exactly."""
    decoder = DecoderSplatting(
        DecoderSplattingCfg(
            render=RenderSettings(capacity=64, big_capacity=8, chunk=64)
        )
    )
    gaussians, extr, intr, near, far = _scene()
    mesh = make_mesh()
    assert mesh.size == 8

    ref = decoder(gaussians, extr, intr, near, far, (32, 32))
    out = render_views_sharded(
        decoder, mesh, gaussians, extr, intr, near, far, (32, 32)
    )
    assert out.color.shape == ref.color.shape
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), rtol=1e-5, atol=1e-5
    )


def test_view_sharded_depth_mode():
    decoder = DecoderSplatting(
        DecoderSplattingCfg(
            render=RenderSettings(capacity=64, big_capacity=8, chunk=64)
        )
    )
    gaussians, extr, intr, near, far = _scene(v=3)
    mesh = make_mesh()
    out = render_views_sharded(
        decoder, mesh, gaussians, extr, intr, near, far, (32, 32),
        depth_mode="depth",
    )
    assert out.depth.shape == (1, 3, 32, 32)
    assert bool(jnp.isfinite(out.depth).all())
