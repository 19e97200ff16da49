import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.geometry import (
    get_depth,
    get_world_rays,
    project,
    project_rays,
)

INTRINSICS = jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])


def look_along_z(translation):
    return jnp.eye(4).at[:3, 3].set(jnp.asarray(translation))


def test_segment_endpoints_lie_on_ray():
    """Points on the projected segment must reproject onto the source ray."""
    # Camera A at origin; camera B one unit to the right, both facing +Z.
    cam_a = look_along_z([0.0, 0.0, 0.0])
    cam_b = look_along_z([1.0, 0.0, 0.0])

    # Cast rays from A's pixel grid.
    coords = jnp.array([[0.4, 0.6], [0.5, 0.5], [0.7, 0.3]])
    origins, directions = get_world_rays(coords, cam_a, INTRINSICS)

    seg = project_rays(origins, directions, cam_b[None], INTRINSICS[None])
    assert bool(seg.overlaps_image.any())

    # Check both segment endpoints: the 3D point at the endpoint's t must
    # reproject into camera B exactly at the reported xy. t_max may be inf
    # (projection at infinity) — clamp to a huge value for the check.
    for t_end, xy_expected in [(seg.t_min, seg.xy_min), (seg.t_max, seg.xy_max)]:
        t = jnp.where(jnp.isfinite(t_end), t_end, 1e5)
        pts = origins + t[..., None] * directions
        xy, _ = project(pts, cam_b, INTRINSICS)
        valid = np.asarray(seg.overlaps_image)
        np.testing.assert_allclose(
            np.asarray(xy)[valid], np.asarray(xy_expected)[valid], atol=1e-3
        )


def test_segment_endpoints_inside_image():
    cam_a = look_along_z([0.0, 0.0, 0.0])
    cam_b = look_along_z([1.0, 0.0, 0.0])
    coords = jnp.stack(
        jnp.meshgrid(jnp.linspace(0.1, 0.9, 5), jnp.linspace(0.1, 0.9, 5)), axis=-1
    ).reshape(-1, 2)
    origins, directions = get_world_rays(coords, cam_a, INTRINSICS)
    seg = project_rays(origins, directions, cam_b[None], INTRINSICS[None])
    ov = np.asarray(seg.overlaps_image)
    eps = 1e-4
    for xy in [np.asarray(seg.xy_min), np.asarray(seg.xy_max)]:
        assert (xy[ov] >= -eps).all() and (xy[ov] <= 1 + eps).all()


def test_ray_behind_camera_does_not_overlap():
    """A ray cast from far behind camera B pointing away never overlaps."""
    cam_b = look_along_z([0.0, 0.0, 0.0])
    origins = jnp.array([[0.0, 0.0, -10.0]])
    directions = jnp.array([[0.0, 0.0, -1.0]])  # pointing further behind
    seg = project_rays(origins, directions, cam_b[None], INTRINSICS[None])
    assert not bool(seg.overlaps_image.any())


def test_near_far_clamps_segment():
    cam_a = look_along_z([0.0, 0.0, 0.0])
    cam_b = look_along_z([1.0, 0.0, 0.0])
    coords = jnp.array([[0.5, 0.5]])
    origins, directions = get_world_rays(coords, cam_a, INTRINSICS)
    near = jnp.array([2.0])
    far = jnp.array([5.0])
    seg = project_rays(
        origins, directions, cam_b[None], INTRINSICS[None], near=near, far=far
    )
    if bool(seg.overlaps_image[0]):
        assert float(seg.t_min[0]) >= 2.0 - 1e-4
        assert float(seg.t_max[0]) <= 5.0 + 1e-4


def test_get_depth_recovers_point_depth():
    """Project a known 3D point into camera B; get_depth should recover its
    distance from the ray origin."""
    cam_a = look_along_z([0.0, 0.0, 0.0])
    cam_b = look_along_z([1.0, 0.0, 0.0])

    point = jnp.array([0.2, -0.1, 3.0])
    # Ray from A through the point.
    direction = point / jnp.linalg.norm(point)
    origin = jnp.zeros(3)

    xy_b, _ = project(point, cam_b, INTRINSICS)
    depth = get_depth(origin, direction, xy_b, cam_b, INTRINSICS)
    np.testing.assert_allclose(float(depth), float(jnp.linalg.norm(point)), rtol=1e-4)


def test_project_rays_jit_and_vmap():
    cam_a = look_along_z([0.0, 0.0, 0.0])
    cam_b = look_along_z([1.0, 0.0, 0.0])
    coords = jnp.array([[0.5, 0.5], [0.25, 0.5]])
    origins, directions = get_world_rays(coords, cam_a, INTRINSICS)

    @jax.jit
    def fn(o, d):
        return project_rays(o, d, cam_b[None], INTRINSICS[None])

    seg = fn(origins, directions)
    assert seg.t_min.shape == (2,)
    assert seg.xy_min.shape == (2, 2)
