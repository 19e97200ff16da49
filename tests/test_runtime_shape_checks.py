"""jaxtyping + typeguard runtime shape harness (reference parity §4.1).

The reference wraps every src import in
jaxtyping.install_import_hook(("src",), ("beartype", "beartype"))
(/root/reference/src/main.py:16-19) so shape bugs crash at call time.
Here the geometry module carries live jaxtyping annotations; this test
installs the hook (with typeguard, since beartype is not in the image)
and verifies both the pass and the crash direction.
"""

import sys

import jax.numpy as jnp
import pytest
from jaxtyping import install_import_hook


@pytest.fixture()
def checked_projection():
    # Re-import the geometry module under the hook.
    saved = {
        k: v for k, v in sys.modules.items() if k.startswith("pixelsplat_tpu")
    }
    for k in saved:
        del sys.modules[k]
    with install_import_hook("pixelsplat_tpu", "typeguard.typechecked"):
        from pixelsplat_tpu.geometry import projection
    yield projection
    for k in [k for k in sys.modules if k.startswith("pixelsplat_tpu")]:
        del sys.modules[k]
    sys.modules.update(saved)


def test_correct_shapes_pass(checked_projection):
    p = checked_projection
    e = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    out = p.inverse_se3(e)
    assert out.shape == (2, 4, 4)
    xy = jnp.full((2, 5, 2), 0.5)
    k = jnp.broadcast_to(jnp.eye(3), (2, 1, 3, 3))
    origins, directions = p.get_world_rays(xy, e[:, None], k)
    assert origins.shape == (2, 5, 3)


def test_wrong_shapes_crash(checked_projection):
    p = checked_projection
    with pytest.raises(Exception):
        p.inverse_se3(jnp.zeros((2, 3, 3)))  # not 4x4
    with pytest.raises(Exception):
        p.get_world_rays(
            jnp.zeros((2, 3)),  # xy must be (..., 2)
            jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
            jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        )
