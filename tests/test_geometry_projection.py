import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.geometry import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    inverse_intrinsics,
    inverse_se3,
    project,
    sample_image_grid,
    unproject,
)


def random_pose(key):
    """Random c2w pose with rotation from QR decomposition."""
    k1, k2 = jax.random.split(key)
    m = jax.random.normal(k1, (3, 3))
    q, r = jnp.linalg.qr(m)
    q = q * jnp.sign(jnp.diagonal(r))
    # Ensure a proper rotation (det +1).
    q = q * jnp.linalg.det(q)
    t = jax.random.normal(k2, (3,))
    pose = jnp.eye(4).at[:3, :3].set(q).at[:3, 3].set(t)
    return pose


def simple_intrinsics():
    return jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])


def test_homogenize():
    p = jnp.ones((2, 3))
    assert homogenize_points(p).shape == (2, 4)
    assert float(homogenize_points(p)[0, 3]) == 1.0
    assert float(homogenize_vectors(p)[0, 3]) == 0.0


def test_inverse_se3_matches_general_inverse():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    poses = jnp.stack([random_pose(k) for k in keys])
    np.testing.assert_allclose(
        np.asarray(inverse_se3(poses)), np.linalg.inv(np.asarray(poses)), atol=1e-5
    )


def test_inverse_intrinsics_matches_general_inverse():
    k = jnp.array([[0.9, 0.01, 0.52], [0.0, 1.2, 0.48], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(inverse_intrinsics(k)), np.linalg.inv(np.asarray(k)), atol=1e-6
    )


def test_project_unproject_roundtrip():
    intrinsics = simple_intrinsics()
    coords = jnp.array([[0.25, 0.75], [0.5, 0.5], [0.9, 0.1]])
    z = jnp.array([1.0, 2.0, 5.0])
    points_cam = unproject(coords, z, intrinsics)
    # Camera at identity: projection should give back the coords.
    xy, in_front = project(points_cam, jnp.eye(4), intrinsics)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-5)
    assert bool(in_front.all())


def test_project_roundtrip_with_pose():
    key = jax.random.PRNGKey(1)
    pose = random_pose(key)
    intrinsics = simple_intrinsics()
    coords = jnp.array([[0.3, 0.6], [0.5, 0.5]])
    origins, directions = get_world_rays(coords, pose, intrinsics)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(directions), axis=-1), 1.0, atol=1e-5
    )
    # Walk along the ray; reprojection should recover the pixel.
    for t in [0.5, 1.0, 3.0]:
        pts = origins + t * directions
        xy, in_front = project(pts, pose, intrinsics)
        np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-4)
        assert bool(in_front.all())


def test_sample_image_grid():
    xy, idx = sample_image_grid((2, 4))
    assert xy.shape == (2, 4, 2)
    assert idx.shape == (2, 4, 2)
    # xy ordering: first channel is x (width direction, 4 entries).
    np.testing.assert_allclose(np.asarray(xy[0, :, 0]), [0.125, 0.375, 0.625, 0.875])
    np.testing.assert_allclose(np.asarray(xy[:, 0, 1]), [0.25, 0.75])
    assert idx[1, 2, 0] == 1 and idx[1, 2, 1] == 2


def test_intersect_rays_exact():
    # Two rays that intersect at (1, 1, 1).
    o1 = jnp.array([0.0, 1.0, 1.0])
    d1 = jnp.array([1.0, 0.0, 0.0])
    o2 = jnp.array([1.0, 0.0, 1.0])
    d2 = jnp.array([0.0, 1.0, 0.0])
    p = intersect_rays(o1, d1, o2, d2)
    np.testing.assert_allclose(np.asarray(p), [1.0, 1.0, 1.0], atol=1e-5)


def test_intersect_rays_parallel_gives_inf():
    o1 = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([1.0, 0.0, 0.0])
    o2 = jnp.array([0.0, 1.0, 0.0])
    p = intersect_rays(o1, d, o2, d)
    assert bool(jnp.all(p > 1e9))


def test_get_fov():
    # Normalized fx = 1.0 -> ray through x=0 is (-0.5, 0, 1); fov_x is the
    # angle between (-0.5,0,1) and (0.5,0,1) = 2*atan(0.5).
    intrinsics = simple_intrinsics()[None]
    fov = get_fov(intrinsics)[0]
    expected = 2 * np.arctan(0.5)
    np.testing.assert_allclose(np.asarray(fov), [expected, expected], atol=1e-5)


def test_projection_is_jittable():
    intrinsics = simple_intrinsics()
    pose = jnp.eye(4)
    coords = jnp.array([[0.5, 0.5]])

    @jax.jit
    def fn(c):
        o, d = get_world_rays(c, pose, intrinsics)
        return o + d

    fn(coords)  # must not raise
