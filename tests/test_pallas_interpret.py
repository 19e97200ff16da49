"""Pallas kernel logic tests in interpreter mode (no TPU required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.ops.rasterizer.composite import (
    _xla_composite_core,
    pack_table_u16,
)
from pixelsplat_tpu.ops.rasterizer.pallas_backward import pallas_composite_bwd
from pixelsplat_tpu.ops.rasterizer.pallas_composite import (
    F,
    NPROC_CH,
    TRANS_CH,
    pallas_composite_core,
    unpack_rows,
)

T, K = 2, 256
TILES_X = 2
MAXB = K // 128


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    params = np.zeros((T, F, K), np.float32)
    params[:, 0] = rng.uniform(0, 32, (T, K))  # mx
    params[:, 1] = rng.uniform(0, 16, (T, K))  # my
    params[:, 2] = 0.5
    params[:, 4] = 0.5
    params[:, 5] = rng.uniform(0.1, 0.6, (T, K))
    params[:, 6:9] = rng.uniform(0, 1, (T, 3, K))
    counts = np.asarray([K, K // 2], np.int32)
    # Zero opacity beyond each tile's count (the contract from
    # the per-tile list assembly).
    params[1, 5, K // 2 :] = 0.0
    return jnp.asarray(params), jnp.asarray(counts)


def to_flat_u16(params, counts):
    """(T, F, K) f32 oracle layout -> production flat layout:
    (n_blocks + margin, 2F, C) u16 blocks (ceil(count/C) blocks per tile,
    zero margin for the DMA lookahead) + (T,) block starts.
    """
    t, f, k = params.shape
    rows = pack_table_u16(params.transpose(0, 2, 1))  # (T, K, 2F)
    blocks, bstart = [], []
    for ti in range(t):
        nbt = max(1, -(-int(counts[ti]) // 128))
        bstart.append(len(blocks))
        for j in range(nbt):
            blocks.append(rows[ti, j * 128 : (j + 1) * 128].T)  # (2F, C)
    for _ in range(MAXB):
        blocks.append(jnp.zeros_like(blocks[0]))
    return jnp.stack(blocks), jnp.asarray(bstart, jnp.int32)


def test_u16_roundtrip_is_bit_exact(scene):
    params, counts = scene
    flat, bstart = to_flat_u16(params, counts)
    back = jax.vmap(unpack_rows)(flat)  # (NB, F, C)
    t, f, k = params.shape
    # Tile 0 is fully resident: its two blocks must round-trip exactly.
    got = np.asarray(back[0:2]).transpose(1, 0, 2).reshape(f, 256)
    assert (
        got.view(np.uint32) == np.asarray(params[0]).view(np.uint32)
    ).all()


def test_forward_matches_xla(scene):
    params, counts = scene
    flat, bstart = to_flat_u16(params, counts)
    acc_p, trans_p, n_proc = pallas_composite_core(
        flat, counts, bstart, TILES_X, MAXB, interpret=True
    )  # acc_p: (T, CH_PAD, P)
    acc_x, trans_x = _xla_composite_core(params, counts, TILES_X)
    np.testing.assert_allclose(
        np.asarray(acc_p.transpose(0, 2, 1)), np.asarray(acc_x), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(trans_p), np.asarray(trans_x), atol=2e-4)
    assert np.asarray(n_proc).tolist() == [2, 1]  # tile 1 has half the depth


def test_backward_matches_xla_autodiff(scene):
    params, counts = scene

    def loss_xla(p):
        acc, trans = _xla_composite_core(p, counts, TILES_X)
        return jnp.sum(acc[..., :3] ** 2) + 0.3 * jnp.sum(trans)

    g_xla = jax.grad(loss_xla)(params)

    # Drive the pallas backward with the same cotangents the XLA loss
    # produces: dL/dacc = 2*acc (channels 0..2), dL/dtrans = 0.3.
    flat, bstart = to_flat_u16(params, counts)
    acc, trans, n_proc = pallas_composite_core(
        flat, counts, bstart, TILES_X, MAXB, interpret=True
    )  # acc: (T, CH_PAD, P)
    g_acc = (2.0 * acc).at[:, 3:, :].set(0.0)
    g_trans = jnp.full_like(trans, 0.3)
    packed_g = (
        g_acc.at[:, NPROC_CH, :].set(trans).at[:, TRANS_CH, :].set(g_trans)
    )
    g_pallas = pallas_composite_bwd(
        flat, n_proc, bstart, packed_g, TILES_X, MAXB,
        counts=counts, interpret=True,
    )

    gx = np.asarray(g_xla)
    gp = np.asarray(g_pallas)  # (NB, F, C) flat blocks
    # Entries past a tile's count carry zero opacity: the XLA grad is
    # exactly zero there (the alpha `where` gates it), and the flat
    # layout simply has no blocks for them.
    assert np.abs(gx[1, :, K // 2 :]).max() == 0.0
    per_tile = {
        0: gp[0:2].transpose(1, 0, 2).reshape(F, 256),
        1: np.concatenate([gp[2], np.zeros((F, 128), np.float32)], axis=1),
    }
    for ti, got in per_tile.items():
        for row in range(9):
            scale = np.abs(gx[ti, row]).max() + 1e-9
            np.testing.assert_allclose(
                got[row] / scale, gx[ti, row] / scale, atol=5e-3,
                err_msg=f"tile {ti} row {row}",
            )


def test_empty_tile(scene):
    params, _ = scene
    counts = jnp.asarray([0, 0], jnp.int32)
    flat, bstart = to_flat_u16(params, jnp.asarray([K, K // 2]))
    acc, trans, n_proc = pallas_composite_core(
        flat, counts, bstart, TILES_X, MAXB, interpret=True
    )
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(trans), 1.0, atol=1e-7)
    assert np.asarray(n_proc).tolist() == [0, 0]
