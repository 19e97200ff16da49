import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsplat_tpu.ops.sh import eval_sh, rotate_sh, sh_basis, sh_rotation_matrix


def random_rotation(key):
    m = jax.random.normal(key, (3, 3))
    q, r = jnp.linalg.qr(m)
    q = q * jnp.sign(jnp.diagonal(r))
    return q * jnp.linalg.det(q)


def random_unit(key, shape=()):
    v = jax.random.normal(key, (*shape, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_basis_dc_constant():
    d = random_unit(jax.random.PRNGKey(0), (5,))
    b = sh_basis(d, 0)
    np.testing.assert_allclose(np.asarray(b), 0.28209479, rtol=1e-5)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_rotation_matrix_identity(degree):
    m = sh_rotation_matrix(jnp.eye(3), degree)
    np.testing.assert_allclose(np.asarray(m), np.eye(2 * degree + 1), atol=1e-4)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_rotation_matrix_property(degree):
    """sh_basis_l(R d) == M_l(R) sh_basis_l(d)."""
    key = jax.random.PRNGKey(degree)
    k1, k2 = jax.random.split(key)
    rot = random_rotation(k1)
    d = random_unit(k2, (20,))
    lo, hi = degree**2, (degree + 1) ** 2
    lhs = sh_basis(jnp.einsum("ij,nj->ni", rot, d), degree)[:, lo:hi]
    m = sh_rotation_matrix(rot, degree)
    rhs = jnp.einsum("ij,nj->ni", m, sh_basis(d, degree)[:, lo:hi])
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-4)


def test_rotate_sh_function_follows_rotation():
    """eval(rotate_sh(c, R), R @ d) == eval(c, d) for full degree-4 stacks."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    rot = random_rotation(k1)
    coeffs = jax.random.normal(k2, (3, 25)) * 0.3
    d = random_unit(k3, (50,))

    rotated = rotate_sh(coeffs, rot)
    lhs = eval_sh(rotated[None], jnp.einsum("ij,nj->ni", rot, d))
    rhs = eval_sh(coeffs[None], d)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-4)


def test_rotation_matrices_are_orthogonal():
    """Rotation of an orthonormal basis stays orthonormal."""
    rot = random_rotation(jax.random.PRNGKey(3))
    for degree in range(1, 5):
        m = np.asarray(sh_rotation_matrix(rot, degree))
        np.testing.assert_allclose(m @ m.T, np.eye(2 * degree + 1), atol=5e-4)


def test_rotate_sh_batched():
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    rots = jnp.stack([random_rotation(k) for k in keys])
    coeffs = jax.random.normal(jax.random.PRNGKey(12), (4, 3, 25))
    out = rotate_sh(coeffs, rots[:, None, :, :])
    assert out.shape == (4, 3, 25)
    # Matches per-element application.
    single = rotate_sh(coeffs[2], rots[2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), atol=1e-5)
