"""Camera projection math in pure JAX.

Coordinate conventions (matching the reference, see
/root/reference/src/geometry/projection.py and README "Camera Conventions"):

* Extrinsics are OpenCV-style **camera-to-world** 4x4 matrices (+Z look,
  +X right, -Y up).
* Intrinsics are 3x3 and **normalized** (row 0 divided by image width,
  row 1 by image height), so image coordinates live in [0, 1]^2.

All functions are shape-polymorphic over leading batch dimensions and are
safe to use under `jit`/`vmap`/`pjit` (no data-dependent Python control
flow, static shapes only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jaxtyping import Array, Float

# Annotations on this module are live: entry points (and the test suite)
# install jaxtyping's import hook with a typeguard checker, reproducing
# the reference's pervasive beartype/jaxtyping runtime harness
# (/root/reference/src/main.py:16-19). Without the hook they are
# documentation only and cost nothing.
from einops import rearrange

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def homogenize_points(points: Float[Array, "*batch dim"]) -> Float[Array, "*batch dim_p1"]:
    """Convert batched points (xyz) to (xyz1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Float[Array, "*batch dim"]) -> Float[Array, "*batch dim_p1"]:
    """Convert batched vectors (xyz) to (xyz0)."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: jax.Array, transformation: jax.Array) -> jax.Array:
    """Apply a rigid-body transformation to points or vectors.

    `homogeneous` has shape (*batch, d); `transformation` (*batch, d, d).
    """
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: jax.Array, extrinsics: jax.Array) -> jax.Array:
    """Transform points from 3D camera coordinates to 3D world coordinates."""
    return transform_rigid(homogeneous, extrinsics)


def transform_world2cam(homogeneous: jax.Array, extrinsics: jax.Array) -> jax.Array:
    """Transform points from 3D world coordinates to 3D camera coordinates."""
    return transform_rigid(homogeneous, inverse_se3(extrinsics))


def inverse_se3(extrinsics: Float[Array, "*batch 4 4"]) -> Float[Array, "*batch 4 4"]:
    """Invert a batch of rigid-body (SE3) 4x4 matrices in closed form.

    Cheaper and better conditioned on TPU than a general 4x4 inverse.
    """
    r = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], extrinsics.dtype),
        (*extrinsics.shape[:-2], 4),
    )
    top = jnp.concatenate([r_inv, t_inv[..., None]], axis=-1)
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def inverse_intrinsics(intrinsics: Float[Array, "*batch 3 3"]) -> Float[Array, "*batch 3 3"]:
    """Invert a batch of 3x3 upper-triangular intrinsics in closed form."""
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    s = intrinsics[..., 0, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    row0 = jnp.stack([inv_fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], axis=-1)
    row1 = jnp.stack([zero, inv_fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_camera_space(
    points: jax.Array,
    intrinsics: jax.Array,
    epsilon: float = _F32_EPS,
    infinity: float = 1e8,
) -> jax.Array:
    """Perspective-divide camera-space points and apply the intrinsics."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: jax.Array,
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    epsilon: float = _F32_EPS,
) -> tuple[jax.Array, jax.Array]:
    """Project world points into a camera.

    Returns (xy in [0,1]^2, in_front_of_camera mask).
    """
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front_of_camera = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front_of_camera


def unproject(coordinates: jax.Array, z: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unproject 2D (normalized) camera coordinates with the given Z values."""
    coordinates = homogenize_points(coordinates)
    ray_directions = jnp.einsum(
        "...ij,...j->...i", inverse_intrinsics(intrinsics), coordinates
    )
    return ray_directions * z[..., None]


def get_world_rays(
    coordinates: Float[Array, "*#batch 2"],
    extrinsics: Float[Array, "*#batch 4 4"],
    intrinsics: Float[Array, "*#batch 3 3"],
) -> tuple[Float[Array, "*batch 3"], Float[Array, "*batch 3"]]:
    """Cast world-space rays through normalized image coordinates.

    Returns (origins, directions); directions are unit-norm.
    """
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(
    shape: tuple[int, ...],
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Normalized (0..1) pixel-center coordinates and integer indices.

    Returns (coordinates with xy ordering, shape (*shape, dim);
             indices with ij ordering, shape (*shape, dim)).
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coordinates = [
        (idx.astype(dtype) + 0.5) / length for idx, length in zip(indices, shape)
    ]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def sample_training_rays(
    key: jax.Array,
    image: jax.Array,  # (b, v, c, *grid)
    intrinsics: jax.Array,  # (b, v, 3, 3)
    extrinsics: jax.Array,  # (b, v, 4, 4)
    num_rays: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample random training rays (origins, directions, colors)."""
    b, v, _, *grid_shape = image.shape
    xy, _ = sample_image_grid(tuple(grid_shape))
    xy = rearrange(xy, "... d -> ... 1 1 d")
    origins, directions = get_world_rays(xy, extrinsics, intrinsics)
    origins = rearrange(origins, "... b v xy -> b (v ...) xy")
    directions = rearrange(directions, "... b v xy -> b (v ...) xy")
    pixels = rearrange(image, "b v c ... -> b (v ...) c")

    num_possible = pixels.shape[1]
    ray_indices = jax.random.randint(key, (b, num_rays), 0, num_possible)
    take = jax.vmap(lambda arr, idx: arr[idx])
    return take(origins, ray_indices), take(directions, ray_indices), take(pixels, ray_indices)


def intersect_rays(
    origins_x: jax.Array,
    directions_x: jax.Array,
    origins_y: jax.Array,
    directions_y: jax.Array,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> jax.Array:
    """Least-squares intersection point of two ray bundles.

    Solves sum_i (n_i n_i^T - I) p = sum_i (n_i n_i^T - I) o_i. Parallel ray
    pairs get all-`inf` results (mirrors reference behavior at
    /root/reference/src/geometry/projection.py:176-230), handled with a
    `where` mask instead of boolean compaction so it stays jittable.
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    origins_x = jnp.broadcast_to(origins_x, shape)
    directions_x = jnp.broadcast_to(directions_x, shape)
    origins_y = jnp.broadcast_to(origins_y, shape)
    directions_y = jnp.broadcast_to(directions_y, shape)

    parallel = jnp.einsum("...i,...i->...", directions_x, directions_y) > 1 - eps

    eye = jnp.eye(3, dtype=origins_x.dtype)
    n_x = jnp.einsum("...i,...j->...ij", directions_x, directions_x) - eye
    n_y = jnp.einsum("...i,...j->...ij", directions_y, directions_y) - eye
    lhs = n_x + n_y
    rhs = jnp.einsum("...ij,...j->...i", n_x, origins_x) + jnp.einsum(
        "...ij,...j->...i", n_y, origins_y
    )

    # Regularize so near-singular (near-parallel) systems stay finite; those
    # entries are overwritten by the parallel mask anyway.
    lhs = lhs + jnp.where(parallel, 1.0, 0.0)[..., None, None] * eye
    result = _solve3x3(lhs, rhs)
    return jnp.where(parallel[..., None], jnp.asarray(inf, result.dtype), result)


def _solve3x3(a: jax.Array, b: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Closed-form 3x3 solve via the adjugate (Cramer's rule).

    Batched tiny solves through jnp.linalg.solve lower to a blocked-LU
    custom call on TPU that dominated the encoder profile (~200 ms for
    262k systems); the adjugate is a handful of fused elementwise ops.
    """
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)

    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def get_fov(intrinsics: jax.Array) -> jax.Array:
    """Horizontal/vertical field of view (radians) from normalized intrinsics.

    Returns (..., 2) with (fov_x, fov_y). Matches the reference definition
    (/root/reference/src/geometry/projection.py:233-247): the angle between
    the unprojected rays through opposite edge midpoints.
    """
    intrinsics_inv = inverse_intrinsics(intrinsics)

    def process(vector):
        vector = jnp.asarray(vector, dtype=intrinsics.dtype)
        vector = jnp.einsum("...ij,j->...i", intrinsics_inv, vector)
        return vector / jnp.linalg.norm(vector, axis=-1, keepdims=True)

    left = process([0.0, 0.5, 1.0])
    right = process([1.0, 0.5, 1.0])
    top = process([0.5, 0.0, 1.0])
    bottom = process([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip((left * right).sum(-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip((top * bottom).sum(-1), -1.0, 1.0))
    return jnp.stack((fov_x, fov_y), axis=-1)
