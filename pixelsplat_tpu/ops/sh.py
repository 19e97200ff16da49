"""Real spherical harmonics: evaluation and rotation, in pure JAX.

Basis convention matches the 3DGS rasterizer family (the reference's CUDA
backend evaluates this basis in `computeColorFromSH`): per degree l the
coefficients are ordered m = -l..l, and terms with odd |m| carry a flipped
sign relative to the standard real SH tables.

SH *rotation* (the reference uses e3nn Wigner-D matrices,
/root/reference/src/misc/sh_rotation.py) is implemented here by exact
resampling: the degree-l subspace is closed under rotation, so the rotation
matrix is M_l(R) = B_l(R D) @ pinv(B_l(D)) for any full-rank fixed direction
set D. The pseudo-inverse is a compile-time constant; per-rotation cost is a
handful of basis evaluations plus small matmuls — no Euler angles, no
branching, fully differentiable, MXU-friendly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Number of coefficients for degree d is (d+1)^2.
MAX_DEGREE = 4


def sh_basis_components(x, y, z, degree: int, xp=jnp) -> list:
    """Real SH basis values as a list of arrays (one per coefficient).

    Component form keeps TPU code in plain vector ops — callers that want
    structure-of-arrays layouts (e.g. the rasterizer's projection stage)
    avoid a minor-dim stack.
    """
    one = xp.ones_like(x)
    out = [0.28209479177387814 * one]
    if degree >= 1:
        out += [
            -0.4886025119029199 * y,
            0.4886025119029199 * z,
            -0.4886025119029199 * x,
        ]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (2.0 * zz - xx - yy),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if degree >= 3:
        out += [
            -0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            -0.4570457994644658 * y * (4.0 * zz - xx - yy),
            0.3731763325901154 * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            -0.4570457994644658 * x * (4.0 * zz - xx - yy),
            1.445305721320277 * z * (xx - yy),
            -0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            2.5033429417967046 * xy * (xx - yy),
            -1.7701307697799304 * yz * (3.0 * xx - yy),
            0.9461746957575601 * xy * (7.0 * zz - 1.0),
            -0.6690465435572892 * yz * (7.0 * zz - 3.0),
            0.10578554691520431 * (35.0 * zz * zz - 30.0 * zz + 3.0),
            -0.6690465435572892 * xz * (7.0 * zz - 3.0),
            0.47308734787878004 * (xx - yy) * (7.0 * zz - 1.0),
            -1.7701307697799304 * xz * (xx - 3.0 * yy),
            0.6258357354491761 * (xx * xx - 6.0 * xx * yy + yy * yy),
        ]
    return out


def sh_basis(dirs: jax.Array, degree: int, xp=jnp) -> jax.Array:
    """Evaluate the real SH basis at unit directions.

    Args:
      dirs: (..., 3) unit vectors.
      degree: max SH degree (0..4).
      xp: array namespace (jnp, or np for float64 compile-time constants).
    Returns:
      (..., (degree+1)^2) basis values.
    """
    out = sh_basis_components(
        dirs[..., 0], dirs[..., 1], dirs[..., 2], degree, xp=xp
    )
    return xp.stack(out, axis=-1)


def eval_sh(sh_coefficients: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH color: (..., 3, d_sh) coefficients at (..., 3) directions.

    Returns (..., 3) colors using the 3DGS convention (+0.5 offset, clamped
    at zero), matching the reference rasterizer's computeColorFromSH.
    """
    n = sh_coefficients.shape[-1]
    degree = int(np.sqrt(n)) - 1
    basis = sh_basis(dirs, degree)  # (..., d_sh)
    color = jnp.einsum("...cd,...d->...c", sh_coefficients, basis)
    return jnp.maximum(color + 0.5, 0.0)


@lru_cache(maxsize=None)
def _fixed_directions_and_pinv(degree: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed sample directions D and pinv(B_l(D)) for the resampling trick.

    Uses a deterministic, well-spread direction set (Fibonacci sphere) with
    N = 2*(2l+1) points for conditioning; returns float64 constants that are
    cast to the working dtype at trace time.
    """
    n_coef = 2 * degree + 1
    n_dirs = 2 * n_coef
    i = np.arange(n_dirs, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n_dirs)
    golden = np.pi * (1 + 5**0.5)
    theta = golden * i
    dirs = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )
    # Basis of just degree-l terms at these directions (float64 numpy so the
    # constant pseudo-inverse is exact to float32 working precision).
    basis_full = sh_basis(dirs, degree, xp=np)
    b_l = basis_full[:, degree**2 : (degree + 1) ** 2]  # (N, 2l+1)
    pinv = np.linalg.pinv(b_l)  # (2l+1, N)
    return dirs, pinv


def sh_rotation_matrix(rotations: jax.Array, degree: int) -> jax.Array:
    """Rotation matrix for the degree-`degree` real SH subspace.

    Satisfies sh_basis_l(R @ d) == M_l(R) @ sh_basis_l(d) for unit d, hence
    rotating coefficients by M_l makes the represented function follow the
    rotation: f'(R d) = f(d) for f' with coefficients M_l c.

    Args:
      rotations: (..., 3, 3) rotation matrices.
    Returns:
      (..., 2l+1, 2l+1).
    """
    if degree == 0:
        return jnp.ones((*rotations.shape[:-2], 1, 1), rotations.dtype)
    dirs, pinv = _fixed_directions_and_pinv(degree)
    dirs = jnp.asarray(dirs, rotations.dtype)  # (N, 3)
    pinv = jnp.asarray(pinv, rotations.dtype)  # (2l+1, N)
    # HIGHEST: on TPU the default bf16 pass puts ~1e-2 relative error into
    # the rotated directions (and thence the whole rotation matrix); these
    # contractions are O(N·9) per camera — precision is free here.
    rotated = jnp.einsum(
        "...ij,nj->...ni", rotations, dirs, precision=jax.lax.Precision.HIGHEST
    )  # (..., N, 3)
    basis_rot = sh_basis(rotated, degree)[
        ..., degree**2 : (degree + 1) ** 2
    ]  # (..., N, 2l+1)
    # M = B(R D)^T-layout: rows index output coefficients.
    return jnp.einsum(
        "...nm,kn->...mk", basis_rot, pinv, precision=jax.lax.Precision.HIGHEST
    )


def full_sh_rotation_matrix(rotations: jax.Array, degree: int) -> jax.Array:
    """Block-diagonal rotation over all degrees 0..degree: (..., n, n).

    One dense (n, n) matrix per rotation so the coefficient rotation is a
    single matmul — per-degree einsums with widths 1/3/5/7/9 force
    minor-dim relayout copies on TPU that cost more than the arithmetic.
    The matrices are tiny (n <= 25) relative to the coefficient batch.
    """
    n = (degree + 1) ** 2
    m = jnp.zeros((*rotations.shape[:-2], n, n), rotations.dtype)
    for l in range(degree + 1):
        block = sh_rotation_matrix(rotations, l)
        m = jax.lax.dynamic_update_slice(
            m, block, (0,) * (m.ndim - 2) + (l**2, l**2)
        )
    return m


def apply_sh_rotation(sh_coefficients: jax.Array, m: jax.Array) -> jax.Array:
    """out[..., i] = sum_j m[..., i, j] * sh[..., j], broadcasting batch dims.

    Where `m`'s batch has trailing size-1 (broadcast) axes against the
    coefficient batch — the common case: one rotation per camera applied to
    every ray/sample/channel — those axes are flattened into the row
    dimension of a single batched (M, n) @ (n, n)^T MXU matmul. The naive
    7-d einsum form makes XLA treat the huge broadcast axes as dot batch
    dims and pick a transposing output layout (measured 3.7 ms of relayout
    copies on the 236 MB encoder harmonics tensor); this form produces the
    default row-major layout so the caller's flattening reshape is free.
    """
    n = sh_coefficients.shape[-1]
    rank = max(m.ndim - 2, sh_coefficients.ndim - 1)
    rb = (1,) * (rank - (m.ndim - 2)) + m.shape[:-2]
    sb = (1,) * (rank - (sh_coefficients.ndim - 1)) + sh_coefficients.shape[:-1]
    m = m.reshape(rb + (n, n))
    sh = sh_coefficients.reshape(sb + (n,))
    # Trailing group of axes over which the rotation is broadcast.
    k = rank
    while k > 0 and rb[k - 1] == 1:
        k -= 1
    lead = tuple(max(a, b) for a, b in zip(rb[:k], sb[:k]))
    tail = sb[k:]
    m = jnp.broadcast_to(m.reshape(rb[:k] + (n, n)), lead + (n, n))
    sh = jnp.broadcast_to(sh, lead + tail + (n,))
    rows = int(np.prod(tail, dtype=np.int64)) if tail else 1
    out = jnp.einsum(
        "...mj,...ij->...mi",
        sh.reshape(lead + (rows, n)),
        m,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + tail + (n,))


def rotate_sh(sh_coefficients: jax.Array, rotations: jax.Array) -> jax.Array:
    """Rotate SH coefficients (..., n) by rotation matrices (..., 3, 3).

    Counterpart of the reference's e3nn-based rotate_sh
    (/root/reference/src/misc/sh_rotation.py:10-30): the rotated function
    evaluated along R @ d equals the original evaluated along d. Used to
    carry camera-frame SH predictions into world space.
    """
    n = sh_coefficients.shape[-1]
    degree = int(np.sqrt(n)) - 1
    m = full_sh_rotation_matrix(rotations, degree)
    return apply_sh_rotation(sh_coefficients, m)
