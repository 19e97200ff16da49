"""BackboneDino end-to-end: ViT + DINO-resnet50 fusion, channels-last."""

import jax
import jax.numpy as jnp

from pixelsplat_tpu.model.encoder.backbone.dino import BackboneDino, BackboneDinoCfg
import pytest

# Multi-minute e2e compiles: excluded from the CI-speed suite
# (python -m pytest -m 'not slow').
pytestmark = pytest.mark.slow


def test_backbone_dino_forward():
    backbone = BackboneDino(BackboneDinoCfg(model="dino_vits16", d_out=32))
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 3, 32, 32))
    params = backbone.init(jax.random.PRNGKey(1), images)
    out = backbone.apply(params, images)
    # Channels-last output, fused resnet + local + global token branches.
    assert out.shape == (1, 2, 32, 32, 32)
    assert bool(jnp.isfinite(out).all())

    # The positional embedding resize path must engage: 32/16 = 2x2 patch
    # grid differs from the checkpoint's 28x28 grid.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k) for k in p) for p, _ in flat]
    assert any("pos_embed" in n for n in names)
    assert any("resnet_backbone" in n for n in names)
