"""DINO ViT backbone in Flax.

Mirrors /root/reference/src/model/encoder/backbone/backbone_dino.py: a
DINO-style ViT (default ViT-B/8) produces a global CLS token and local
patch tokens; both go through small MLPs to d_out, are broadcast to the
pixel grid, and are summed with a ResNet-50 branch. The architecture
matches facebookresearch/dino's ViT so published weights can be imported
(timm/DINO layout: qkv bias, pre-norm blocks, final LayerNorm applied to
intermediate outputs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BackboneResnet, BackboneResnetCfg

VIT_SPECS: dict[str, dict] = {
    "dino_vits16": dict(patch=16, dim=384, depth=12, heads=6),
    "dino_vits8": dict(patch=8, dim=384, depth=12, heads=6),
    "dino_vitb16": dict(patch=16, dim=768, depth=12, heads=12),
    "dino_vitb8": dict(patch=8, dim=768, depth=12, heads=12),
}


@dataclass(frozen=True)
class BackboneDinoCfg:
    name: Literal["dino"] = "dino"
    model: str = "dino_vitb8"
    d_out: int = 512
    # Positional-embedding grid of the checkpoint being loaded. None derives
    # 224 // patch for the selected model (the published DINO weights' grid:
    # 28 for patch-8, 14 for patch-16). Explicit values exist for golden
    # tests against torch fixtures whose grid matches the input exactly.
    pos_grid: int | None = None

    @property
    def resolved_pos_grid(self) -> int:
        if self.pos_grid is not None:
            return self.pos_grid
        return 224 // VIT_SPECS[self.model]["patch"]


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # epsilon=1e-5: torch nn.LayerNorm parity (flax defaults to 1e-6,
        # which drifts ~1e-3 over 12 pre-norm blocks).
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.dim,
            dtype=self.dtype,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        # Exact (erf) GELU: torch's nn.GELU default, which DINO uses.
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class DinoViT(nn.Module):
    """DINO vision transformer trunk; returns normalized (cls, patch) tokens."""

    patch: int
    dim: int
    depth: int
    heads: int
    # Positional-embedding grid the checkpoint was trained with (224/patch).
    pos_grid: int = 28
    dtype: object = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (n, 3, h, w) -> (n, 1 + h/p * w/p, dim) tokens."""
        n, _, h, w = images.shape
        x = images.transpose(0, 2, 3, 1)
        x = nn.Conv(
            self.dim,
            kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.pos_grid * self.pos_grid, self.dim),
        )
        cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            grid = patch_pos.reshape(1, self.pos_grid, self.pos_grid, self.dim)
            grid = jax.image.resize(grid, (1, gh, gw, self.dim), "bicubic")
            patch_pos = grid.reshape(1, gh * gw, self.dim)

        x = x + patch_pos
        cls = jnp.broadcast_to(cls_token + cls_pos, (n, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)

        # Scan over the identical pre-norm blocks instead of unrolling:
        # parameters stack along a leading depth axis and XLA compiles ONE
        # block body (fwd and bwd) instead of `depth` copies — an order of
        # magnitude less HLO for ViT-B/12 with identical math. This is the
        # idiomatic JAX/TPU layout for repeated layers.
        def _block_step(block: ViTBlock, carry, _):
            return block(carry), None

        x, _ = nn.scan(
            _block_step,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
        )(ViTBlock(self.dim, self.heads, dtype=self.dtype, name="blocks"), x, None)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class BackboneDino(nn.Module):
    cfg: BackboneDinoCfg
    dtype: object = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (b, v, 3, h, w) -> (b, v, h, w, d_out) (channels-last)."""
        cfg = self.cfg
        spec = VIT_SPECS[cfg.model]
        patch = spec["patch"]
        b, v, _, h, w = images.shape
        assert h % patch == 0 and w % patch == 0

        resnet_features = BackboneResnet(
            BackboneResnetCfg("resnet", "dino_resnet50", 4, False, cfg.d_out),
            dtype=self.dtype,
            name="resnet_backbone",
        )(images)

        tokens = DinoViT(
            patch=patch,
            dim=spec["dim"],
            depth=spec["depth"],
            heads=spec["heads"],
            pos_grid=cfg.resolved_pos_grid,
            dtype=self.dtype,
            name="dino",
        )(images.reshape(b * v, 3, h, w))

        def token_mlp(t, name):
            t = nn.Dense(spec["dim"], dtype=self.dtype, name=f"{name}_fc1")(t)
            t = nn.relu(t)
            return nn.Dense(cfg.d_out, dtype=self.dtype, name=f"{name}_fc2")(t)

        global_token = token_mlp(tokens[:, 0], "global_token")  # (bv, d_out)
        local_tokens = token_mlp(tokens[:, 1:], "local_token")  # (bv, n, d_out)

        global_token = global_token.reshape(b, v, 1, 1, cfg.d_out)
        gh, gw = h // patch, w // patch
        local_tokens = local_tokens.reshape(b, v, gh, gw, cfg.d_out)
        # Nearest-repeat each patch token over its patch footprint.
        local_tokens = jnp.repeat(jnp.repeat(local_tokens, patch, axis=2), patch, axis=3)

        # All three terms are already channels-last.
        return resnet_features + local_tokens + global_token

    @property
    def d_out(self) -> int:
        return self.cfg.d_out
