"""Rasterizer tests: tiled renderer vs an independent numpy oracle, plus
gradient and invariance checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.ops.rasterizer import (
    RenderSettings,
    render,
    render_depth,
)
from pixelsplat_tpu.ops.sh import sh_basis

IMAGE = (32, 48)
K = np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], np.float32)


def numpy_oracle(extr, intr, image_shape, bg, means, covs, colors, opac):
    """Dense, trusted renderer: every Gaussian vs every pixel, written
    independently of the production code (numpy, per-pixel loops vectorized
    only over pixels)."""
    h, w = image_shape
    w2c = np.linalg.inv(extr)
    fx, fy = intr[0, 0] * w, intr[1, 1] * h
    cx, cy = intr[0, 2] * w, intr[1, 2] * h
    fov_x = 2 * np.arctan(0.5 / intr[0, 0])
    fov_y = 2 * np.arctan(0.5 / intr[1, 1])
    lim_x, lim_y = 1.3 * np.tan(fov_x / 2), 1.3 * np.tan(fov_y / 2)

    t = (w2c[:3, :3] @ means.T).T + w2c[:3, 3]
    order = np.argsort(t[:, 2])

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w, colors.shape[-1]), np.float32)
    trans = np.ones((h, w), np.float32)
    for g in order:
        tz = t[g, 2]
        if tz <= 0.2:
            continue
        mx = fx * t[g, 0] / tz + cx - 0.5
        my = fy * t[g, 1] / tz + cy - 0.5
        txz = np.clip(t[g, 0] / tz, -lim_x, lim_x) * tz
        tyz = np.clip(t[g, 1] / tz, -lim_y, lim_y) * tz
        J = np.array(
            [[fx / tz, 0, -fx * txz / tz**2], [0, fy / tz, -fy * tyz / tz**2]]
        )
        JW = J @ w2c[:3, :3]
        cov2d = JW @ covs[g] @ JW.T
        a, b, c = cov2d[0, 0] + 0.3, cov2d[0, 1], cov2d[1, 1] + 0.3
        det = a * c - b * b
        if det <= 0:
            continue
        ca, cb, cc = c / det, -b / det, a / det
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        r = np.ceil(3 * np.sqrt(lam))
        if mx + r <= 0 or mx - r >= w or my + r <= 0 or my - r >= h:
            continue
        dx = xs - mx
        dy = ys - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = np.minimum(0.99, opac[g] * np.exp(power))
        alpha[(power > 0) | (alpha < 1 / 255)] = 0.0
        img += (trans * alpha)[..., None] * colors[g]
        trans *= 1 - alpha
    img += trans[..., None] * bg
    return img.transpose(2, 0, 1)


def make_scene(seed, g=200, spread=1.0, z_range=(2.0, 8.0)):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, g),
            rng.uniform(-spread, spread, g),
            rng.uniform(*z_range, g),
        ],
        axis=-1,
    ).astype(np.float32)
    # Random PSD covariances with ~pixel-scale footprints.
    axes = rng.normal(size=(g, 3, 3)).astype(np.float32) * 0.05
    covs = axes @ axes.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    colors = rng.uniform(0, 1, (g, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, g).astype(np.float32)
    return means, covs, colors, opac


@pytest.mark.parametrize("seed", [0, 1])
def test_tiled_matches_numpy_oracle(seed):
    means, covs, colors, opac = make_scene(seed)
    extr = np.eye(4, dtype=np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)

    expected = numpy_oracle(extr, K, IMAGE, bg, means, covs, colors, opac)

    got = render(
        jnp.asarray(extr)[None],
        jnp.asarray(K)[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        IMAGE,
        jnp.asarray(bg)[None],
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(colors)[None],
        jnp.asarray(opac)[None],
        scale_invariant=False,
        use_sh=False,
        settings=RenderSettings(capacity=512, big_capacity=64, chunk=64),
    )
    np.testing.assert_allclose(np.asarray(got[0]), expected, atol=2e-3)


def test_big_gaussian_fallback():
    """A Gaussian spanning many tiles must still render (global list)."""
    means = np.array([[0.0, 0.0, 3.0]], np.float32)
    covs = (np.eye(3, dtype=np.float32) * 1.0)[None]  # huge footprint
    colors = np.array([[1.0, 0.0, 0.0]], np.float32)
    opac = np.array([0.9], np.float32)
    extr = np.eye(4, dtype=np.float32)
    bg = np.zeros(3, np.float32)

    expected = numpy_oracle(extr, K, IMAGE, bg, means, covs, colors, opac)
    got = render(
        jnp.asarray(extr)[None],
        jnp.asarray(K)[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        IMAGE,
        jnp.asarray(bg)[None],
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(colors)[None],
        jnp.asarray(opac)[None],
        scale_invariant=False,
        use_sh=False,
        settings=RenderSettings(capacity=64, big_capacity=8, chunk=32),
    )
    assert float(jnp.abs(got[0]).max()) > 0.1  # actually rendered something
    np.testing.assert_allclose(np.asarray(got[0]), expected, atol=2e-3)


def test_scale_invariance():
    """scale_invariant=True must make the render independent of global
    world scale (the 1/near trick)."""
    means, covs, colors, opac = make_scene(3, g=50)
    extr = np.eye(4, dtype=np.float32)
    bg = np.zeros(3, np.float32)

    def go(s):
        return render(
            jnp.asarray(extr).at[:3, 3].multiply(s)[None],
            jnp.asarray(K)[None],
            jnp.full((1,), s),
            jnp.full((1,), 100.0 * s),
            IMAGE,
            jnp.asarray(bg)[None],
            jnp.asarray(means * s)[None],
            jnp.asarray(covs * s * s)[None],
            jnp.asarray(colors)[None],
            jnp.asarray(opac)[None],
            scale_invariant=True,
            use_sh=False,
            settings=RenderSettings(capacity=512, big_capacity=32, chunk=64),
        )

    np.testing.assert_allclose(np.asarray(go(1.0)), np.asarray(go(7.0)), atol=1e-3)


def test_sh_rendering_view_dependence():
    """With degree-1 SH, color must depend on viewing direction."""
    g = 1
    means = jnp.array([[0.0, 0.0, 4.0]])
    covs = jnp.eye(3)[None] * 0.01
    opac = jnp.array([0.9])
    sh = jnp.zeros((g, 3, 4)).at[:, :, 0].set(1.0).at[:, 0, 3].set(2.0)
    bg = jnp.zeros((1, 3))

    def view_from(x):
        extr = jnp.eye(4).at[0, 3].set(x)
        img = render(
            extr[None],
            jnp.asarray(K)[None],
            jnp.ones(1),
            jnp.full((1,), 100.0),
            IMAGE,
            bg,
            means[None],
            covs[None],
            sh[None],
            opac[None],
            scale_invariant=False,
            use_sh=True,
            settings=RenderSettings(capacity=64, big_capacity=8, chunk=32),
        )
        return float(img[0, 0].max())

    # Viewing from the left vs right flips the degree-1 x term's sign.
    assert abs(view_from(-2.0) - view_from(2.0)) > 0.05


def test_gradients_flow_and_match_finite_differences():
    means, covs, colors, opac = make_scene(5, g=20)
    extr = jnp.eye(4)
    bg = jnp.zeros(3)
    settings = RenderSettings(capacity=128, big_capacity=16, chunk=32)

    def loss(op):
        img = render(
            extr[None],
            jnp.asarray(K)[None],
            jnp.ones(1),
            jnp.full((1,), 100.0),
            IMAGE,
            bg[None],
            jnp.asarray(means)[None],
            jnp.asarray(covs)[None],
            jnp.asarray(colors)[None],
            op[None],
            scale_invariant=False,
            use_sh=False,
            settings=settings,
        )
        return jnp.sum(img**2)

    op0 = jnp.asarray(opac)
    g_auto = jax.grad(loss)(op0)
    assert bool(jnp.isfinite(g_auto).all())
    assert float(jnp.abs(g_auto).max()) > 0  # nonzero gradient

    # Finite differences on a few coordinates.
    eps = 1e-3
    for i in [0, 7, 13]:
        up = loss(op0.at[i].add(eps))
        dn = loss(op0.at[i].add(-eps))
        fd = (up - dn) / (2 * eps)
        np.testing.assert_allclose(float(g_auto[i]), float(fd), rtol=0.05, atol=1e-3)


def test_gradients_wrt_means():
    means, covs, colors, opac = make_scene(6, g=10)
    extr = jnp.eye(4)
    settings = RenderSettings(capacity=64, big_capacity=8, chunk=32)

    def loss(m):
        img = render(
            extr[None],
            jnp.asarray(K)[None],
            jnp.ones(1),
            jnp.full((1,), 100.0),
            IMAGE,
            jnp.zeros((1, 3)),
            m[None],
            jnp.asarray(covs)[None],
            jnp.asarray(colors)[None],
            jnp.asarray(opac)[None],
            scale_invariant=False,
            use_sh=False,
            settings=settings,
        )
        return jnp.sum(img * jnp.linspace(0, 1, IMAGE[1]))  # x-weighted

    g_m = jax.grad(loss)(jnp.asarray(means))
    assert bool(jnp.isfinite(g_m).all())
    assert float(jnp.abs(g_m).max()) > 0

    eps = 1e-3
    i, j = 3, 0
    m0 = jnp.asarray(means)
    fd = (loss(m0.at[i, j].add(eps)) - loss(m0.at[i, j].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g_m[i, j]), float(fd), rtol=0.08, atol=2e-3)


def test_render_depth_modes():
    means, covs, colors, opac = make_scene(8, g=100)
    extr = jnp.eye(4)
    args = (
        extr[None],
        jnp.asarray(K)[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        IMAGE,
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(opac)[None],
    )
    for mode in ["depth", "disparity", "relative_disparity", "log"]:
        d = render_depth(*args, mode=mode, settings=RenderSettings(capacity=256))
        assert d.shape == (1, *IMAGE)
        assert bool(jnp.isfinite(d).all())
    d = render_depth(*args, settings=RenderSettings(capacity=256))
    # Depth in the covered region should be within the z range of the scene.
    assert float(d.max()) <= 8.5


def test_empty_scene_gives_background():
    bg = jnp.array([[0.25, 0.5, 0.75]])
    img = render(
        jnp.eye(4)[None],
        jnp.asarray(K)[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        IMAGE,
        bg,
        jnp.zeros((1, 4, 3)).at[..., 2].set(-5.0),  # all behind camera
        jnp.broadcast_to(jnp.eye(3) * 1e-4, (1, 4, 3, 3)),
        jnp.ones((1, 4, 3)) * 0.5,
        jnp.ones((1, 4)) * 0.5,
        scale_invariant=False,
        use_sh=False,
        settings=RenderSettings(capacity=64, big_capacity=8),
    )
    expected = np.broadcast_to(np.asarray(bg)[0][:, None, None], (3, *IMAGE))
    np.testing.assert_allclose(np.asarray(img[0]), expected, atol=1e-5)


def test_wide_key_binning_matches_packed():
    """The two-word (tile, exact-depth) sort path — used automatically at
    very large tile counts, where the packed key runs out of depth bits —
    must produce the same render as the packed single-key path."""
    means, covs, colors, opac = make_scene(3)
    extr = np.eye(4, dtype=np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    args = (
        jnp.asarray(extr)[None],
        jnp.asarray(K)[None],
        jnp.ones(1),
        jnp.full((1,), 100.0),
        IMAGE,
        jnp.asarray(bg)[None],
        jnp.asarray(means)[None],
        jnp.asarray(covs)[None],
        jnp.asarray(colors)[None],
        jnp.asarray(opac)[None],
    )
    kw = dict(scale_invariant=False, use_sh=False)
    packed = render(
        *args,
        settings=RenderSettings(capacity=512, big_capacity=64, chunk=64),
        **kw,
    )
    wide = render(
        *args,
        settings=RenderSettings(
            capacity=512, big_capacity=64, chunk=64, force_wide_keys=True
        ),
        **kw,
    )
    # The wide path keeps MORE depth bits (exact f32 pattern), so lists can
    # only differ where the packed key quantized ties; on this scene they
    # must match to compositing accuracy.
    np.testing.assert_allclose(np.asarray(wide), np.asarray(packed), atol=1e-5)

    expected = numpy_oracle(extr, K, IMAGE, bg, means, covs, colors, opac)
    np.testing.assert_allclose(np.asarray(wide[0]), expected, atol=2e-3)
