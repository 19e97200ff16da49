"""Bilinear grid sampling: torch parity and layout-variant consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.ops.grid_sample import grid_sample, grid_sample_nhwc

torch = pytest.importorskip("torch")


def _random_case(seed, c=5, h=9, w=7, n=50):
    rng = np.random.default_rng(seed)
    image = rng.normal(size=(c, h, w)).astype(np.float32)
    # include in-bounds, out-of-bounds and boundary-straddling coords
    coords = rng.uniform(-1.4, 1.4, size=(n, 2)).astype(np.float32)
    return image, coords


def test_matches_torch_grid_sample():
    image, coords = _random_case(0)
    got = np.asarray(grid_sample(jnp.asarray(image), jnp.asarray(coords)))
    ref = (
        torch.nn.functional.grid_sample(
            torch.from_numpy(image)[None],
            torch.from_numpy(coords)[None, None],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )[0, :, 0]
        .T.numpy()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_nhwc_variant_matches_chw():
    image, coords = _random_case(1)
    chw = np.asarray(grid_sample(jnp.asarray(image), jnp.asarray(coords)))
    nhwc = np.asarray(
        grid_sample_nhwc(jnp.asarray(image.transpose(1, 2, 0)), jnp.asarray(coords))
    )
    np.testing.assert_allclose(nhwc, chw, rtol=1e-6, atol=1e-6)


def test_nhwc_batched_shapes():
    image, _ = _random_case(2)
    coords = np.random.default_rng(3).uniform(-1, 1, (4, 6, 2)).astype(np.float32)
    out = grid_sample_nhwc(jnp.asarray(image.transpose(1, 2, 0)), jnp.asarray(coords))
    assert out.shape == (4, 6, 5)
