"""Sort-based backward for the tile-parameter row gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.ops.rasterizer import tile_gather


@pytest.mark.parametrize("mode", ["merge", "searchsorted"])
def test_gather_rows_matches_xla_vjp(mode, monkeypatch):
    monkeypatch.setattr(tile_gather, "BOUNDS_MODE", mode)
    rows, f = 37, 5
    packed = jax.random.normal(jax.random.PRNGKey(0), (rows, f))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 21), 0, rows, jnp.int32)
    idx = idx.at[:, -3:].set(rows - 1)  # heavy collisions like the sentinel

    out = tile_gather.gather_rows(packed, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(packed[idx]))

    d = jax.random.normal(jax.random.PRNGKey(2), out.shape)
    ref = jax.vjp(lambda p: p[idx], packed)[1](d)[0]
    got = jax.vjp(lambda p: tile_gather.gather_rows(p, idx), packed)[1](d)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gather_rows_empty_and_full_segments():
    """Rows that never appear get zero gradient; rows that fill the whole
    index array get the total."""
    rows, f = 5, 3
    packed = jnp.zeros((rows, f))
    idx = jnp.full((4, 6), 2, jnp.int32)
    d = jnp.ones((4, 6, f))
    got = jax.vjp(lambda p: tile_gather.gather_rows(p, idx), packed)[1](d)[0]
    expected = np.zeros((rows, f))
    expected[2] = 24.0
    np.testing.assert_allclose(np.asarray(got), expected)


def test_gather_rows_under_jit_and_grad():
    rows, f = 16, 4
    packed = jax.random.normal(jax.random.PRNGKey(0), (rows, f))
    idx = jax.random.randint(jax.random.PRNGKey(1), (3, 7), 0, rows, jnp.int32)

    @jax.jit
    def loss(p):
        return (tile_gather.gather_rows(p, idx) ** 2).sum()

    g = jax.grad(loss)(packed)
    g_ref = jax.grad(lambda p: ((p[idx]) ** 2).sum())(packed)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)
