"""Occupancy-adaptive rendering: exactness and capacity selection."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.ops.rasterizer import RenderSettings, render
from pixelsplat_tpu.ops.rasterizer.adaptive import _occupancy_stats, render_adaptive


def _scene(g=512, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    means = jax.random.uniform(ks[0], (1, g, 3), minval=-0.8, maxval=0.8)
    means = means.at[..., 2].add(4.0)
    covs = jnp.broadcast_to(jnp.eye(3) * 2e-4, (1, g, 3, 3))
    sh = jnp.zeros((1, g, 3, 25)).at[..., 0].set(
        jax.random.uniform(ks[1], (1, g, 3)) / 0.2821
    )
    opac = jax.random.uniform(ks[2], (1, g), minval=0.3, maxval=0.9)
    extr = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (1, 3, 3)
    )
    return extr, intr, jnp.ones(1), jnp.full((1,), 100.0), means, covs, sh, opac


def test_adaptive_matches_fixed_capacity():
    extr, intr, near, far, means, covs, sh, opac = _scene()
    settings = RenderSettings(capacity=1024, big_capacity=32, chunk=64)
    bg = jnp.zeros((1, 3))
    ref = render(
        extr, intr, near, far, (64, 64), bg, means, covs, sh, opac,
        settings=settings,
    )
    got = render_adaptive(
        extr, intr, near, far, (64, 64), bg, means, covs, sh, opac,
        settings=settings, capacities=(64, 128, 256),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_occupancy_bounds_capacity():
    extr, intr, near, far, means, covs, sh, opac = _scene()
    m, budget = _occupancy_stats(
        extr, intr, near, means, covs, opac, (64, 64), 16, 2, 32, 64
    )
    m, budget = int(m), int(budget)
    # 512 sparse Gaussians over 16 tiles: occupancy positive but far below
    # the worst case.
    assert 0 < m <= 512 * 4 + 32
    # The flat-budget demand covers every pair plus per-tile alignment.
    assert 0 < budget <= 512 * 4 + 16 * (32 + 64)
    assert budget % 64 == 0


def test_adaptive_budget_matches_default_render():
    """choose_settings' pair budget must not drop pairs the default keeps."""
    from pixelsplat_tpu.ops.rasterizer.adaptive import choose_settings

    extr, intr, near, far, means, covs, sh, opac = _scene(seed=3)
    settings = RenderSettings(capacity=1024, big_capacity=32, chunk=64)
    chosen = choose_settings(
        extr, intr, near, means, covs, opac, (64, 64),
        settings=settings, capacities=(64, 128, 256),
    )
    assert chosen.pair_budget is not None
    bg = jnp.zeros((1, 3))
    ref = render(
        extr, intr, near, far, (64, 64), bg, means, covs, sh, opac,
        settings=settings,
    )
    got, overflow = render(
        extr, intr, near, far, (64, 64), bg, means, covs, sh, opac,
        settings=chosen, return_overflow=True,
    )
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
