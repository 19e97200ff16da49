"""Pretrained-backbone init path (VERDICT item 5).

Uses the torch shims (tests/torch_shims.py) to generate hub-layout DINO
checkpoints with random weights, exports them through the same npz
serialization tools/export_dino_weights.py uses, and verifies:

1. the Flax DinoViT trunk with grafted weights reproduces the torch
   hub module's `get_intermediate_layers` output, and
2. `init_backbone_from_pretrained` grafts the trunks into a fresh
   encoder parameter tree (heads stay randomly initialized).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

# Full ViT-B trunk inits/compiles: ~2 min on CPU.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp


@pytest.fixture()
def hub_weights(tmp_path, monkeypatch):
    import torch_shims

    torch_shims.install_shims()
    torch_shims.DINO_POS_GRID = 2  # 32px / patch 16

    from pixelsplat_tpu.interop import pretrained

    monkeypatch.setattr(pretrained, "WEIGHTS_DIR", tmp_path)

    torch.manual_seed(0)
    vit = torch_shims._fake_hub_load("facebookresearch/dino:main", "dino_vitb16")
    resnet = torch_shims._fake_hub_load(
        "facebookresearch/dino:main", "dino_resnet50"
    )
    for module, name in [(vit, "dino_vitb16"), (resnet, "dino_resnet50")]:
        sd = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
        pretrained.save_state_dict_npz(sd, tmp_path / f"{name}.npz")
    return vit, resnet


def test_vit_trunk_matches_hub_module(hub_weights):
    vit, _ = hub_weights
    from pixelsplat_tpu.interop.pretrained import pretrained_backbone_params
    from pixelsplat_tpu.model.encoder.backbone.dino import (
        VIT_SPECS,
        BackboneDinoCfg,
        DinoViT,
    )

    cfg = BackboneDinoCfg(model="dino_vitb16", d_out=16, pos_grid=2)
    pre = pretrained_backbone_params(cfg)
    assert pre is not None and "dino" in pre and "resnet_backbone" in pre

    spec = VIT_SPECS[cfg.model]
    images = np.random.default_rng(0).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    module = DinoViT(
        patch=spec["patch"],
        dim=spec["dim"],
        depth=spec["depth"],
        heads=spec["heads"],
        pos_grid=2,
    )
    tokens = module.apply({"params": pre["dino"]}, jnp.asarray(images))
    with torch.no_grad():
        expected = vit.get_intermediate_layers(torch.from_numpy(images))[0]
    np.testing.assert_allclose(
        np.asarray(tokens), expected.numpy(), atol=2e-4
    )


def test_encoder_init_grafts_trunks(hub_weights):
    from pixelsplat_tpu.interop.pretrained import (
        init_backbone_from_pretrained,
        pretrained_backbone_params,
    )
    from pixelsplat_tpu.model.encoder.backbone.dino import (
        BackboneDino,
        BackboneDinoCfg,
    )

    cfg = BackboneDinoCfg(model="dino_vitb16", d_out=16, pos_grid=2)
    backbone = BackboneDino(cfg)
    images = jnp.zeros((1, 2, 3, 32, 32))
    variables = {
        "params": {"backbone": backbone.init(jax.random.PRNGKey(0), images)["params"]}
    }

    class _Cfg:
        backbone = cfg

    grafted_vars, n = init_backbone_from_pretrained(variables, _Cfg)
    assert n > 100  # ViT blocks + resnet trunk

    pre = pretrained_backbone_params(cfg)
    got = grafted_vars["params"]["backbone"]["dino"]["cls_token"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(pre["dino"]["cls_token"]))
    # Projection heads are not pretrained: they keep the random init.
    before = variables["params"]["backbone"]["resnet_backbone"]["projection0"]["kernel"]
    after = grafted_vars["params"]["backbone"]["resnet_backbone"]["projection0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # The forward still runs with the grafted tree.
    out = backbone.apply(
        {"params": grafted_vars["params"]["backbone"]},
        jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 3, 32, 32)),
    )
    assert bool(jnp.isfinite(out).all())
