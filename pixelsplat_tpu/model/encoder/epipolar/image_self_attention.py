"""Patchified image self-attention (the epipolar transformer's FF layer).

Mirrors /root/reference/src/model/encoder/epipolar/image_self_attention.py:
patchify with a strided conv, add positionally-encoded patch coordinates,
run a small self-attention transformer, un-patchify with a transposed conv.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....geometry.projection import sample_image_grid
from ...encodings import positional_encoding
from ...transformer.transformer import Transformer


@dataclass(frozen=True)
class ImageSelfAttentionCfg:
    patch_size: int = 4
    num_octaves: int = 10
    num_layers: int = 2
    num_heads: int = 4
    d_token: int = 128
    d_dot: int = 128
    d_mlp: int = 256


class ImageSelfAttention(nn.Module):
    cfg: ImageSelfAttentionCfg
    d_out: int
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, image: jax.Array) -> jax.Array:
        """image: (b, h, w, d_in) -> (b, h, w, d_out) (channels-last)."""
        cfg = self.cfg
        x = image
        tokens = nn.Conv(
            cfg.d_token,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedder",
        )(x)
        tokens = nn.relu(tokens)

        b, nh, nw, _ = tokens.shape
        # PE in f32 (high-octave sin/cos loses precision in bf16);
        # the pe_proj Dense casts down if a compute dtype is set.
        xy, _ = sample_image_grid((nh, nw), dtype=jnp.float32)
        pe = positional_encoding(xy, cfg.num_octaves)  # (nh, nw, pe_dim)
        pe = nn.Dense(cfg.d_token, dtype=self.dtype, name="pe_proj")(pe)
        tokens = tokens + pe[None].astype(tokens.dtype)

        tokens = tokens.reshape(b, nh * nw, cfg.d_token)
        tokens = Transformer(
            dim=cfg.d_token,
            depth=cfg.num_layers,
            heads=cfg.num_heads,
            dim_head=cfg.d_dot,
            mlp_dim=cfg.d_mlp,
            dtype=self.dtype,
            name="transformer",
        )(tokens)
        tokens = tokens.reshape(b, nh, nw, cfg.d_token)

        out = nn.ConvTranspose(
            self.d_out,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="resampler",
        )(tokens)
        return out
