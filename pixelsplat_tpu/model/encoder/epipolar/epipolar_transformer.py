"""Epipolar transformer: per-pixel cross-attention over epipolar samples.

Mirrors /root/reference/src/model/encoder/epipolar/epipolar_transformer.py:
optional strided-conv downscale, epipolar sampling, positional depth
encoding added to the kv features, a 2-layer cross-attention transformer
whose feed-forward is an image self-attention block, and a transposed-conv
upscale with conv refinement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....geometry.epipolar_lines import get_depth
from ...encodings import positional_encoding
from ...transformer.transformer import Transformer
from .conversions import depth_to_relative_disparity
from .epipolar_sampler import EpipolarSampling, sample_along_epipolar_lines
from .image_self_attention import ImageSelfAttention, ImageSelfAttentionCfg


@dataclass(frozen=True)
class EpipolarTransformerCfg:
    self_attention: ImageSelfAttentionCfg = field(default_factory=ImageSelfAttentionCfg)
    num_octaves: int = 10
    num_layers: int = 2
    num_heads: int = 4
    num_samples: int = 32
    d_dot: int = 128
    d_mlp: int = 256
    downscale: int = 4


class _ImageSelfAttentionFF(nn.Module):
    """Feed-forward layer that is an image self-attention block (with its
    own residual), operating on (b*v*h*w, 1, c) token layout."""

    cfg: ImageSelfAttentionCfg
    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, b: int, v: int, h: int, w: int) -> jax.Array:
        c = x.shape[-1]
        img = x.reshape(b * v, h, w, c)
        img = ImageSelfAttention(self.cfg, c, dtype=self.dtype, name="self_attention")(img) + img
        return img.reshape(b * v * h * w, 1, c)


class EpipolarTransformer(nn.Module):
    cfg: EpipolarTransformerCfg
    d_in: int
    num_context_views: int = 2
    dtype: object = None  # compute dtype for matmul-heavy paths

    @nn.compact
    def __call__(
        self,
        features: jax.Array,  # (b, v, h, w, c) channels-last
        extrinsics: jax.Array,  # (b, v, 4, 4)
        intrinsics: jax.Array,  # (b, v, 3, 3)
        near: jax.Array,  # (b, v)
        far: jax.Array,  # (b, v)
        shuffle_rng: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, EpipolarSampling]:
        cfg = self.cfg
        b, v, h_full, w_full, c = features.shape

        if cfg.downscale:
            x = features.reshape(b * v, h_full, w_full, c)
            x = nn.Conv(
                self.d_in,
                kernel_size=(cfg.downscale, cfg.downscale),
                strides=(cfg.downscale, cfg.downscale),
                padding="VALID",
                dtype=self.dtype,
                name="downscaler",
            )(x)
            features = x.reshape(b, v, x.shape[1], x.shape[2], self.d_in)
        h, w = features.shape[2], features.shape[3]

        sampling = sample_along_epipolar_lines(
            features, extrinsics, intrinsics, near, far, cfg.num_samples
        )

        if cfg.num_octaves > 0:
            # Positionally encode each sample's depth (as relative disparity).
            def collect(t):
                from .epipolar_sampler import _collect_other_views

                return _collect_other_views(t, v)

            depths = get_depth(
                sampling.origins[:, :, None, :, None],  # (b, v, 1, r, 1, 3)
                sampling.directions[:, :, None, :, None],
                sampling.xy_sample,  # (b, v, ov, r, s, 2)
                collect(extrinsics)[:, :, :, None, None],
                collect(intrinsics)[:, :, :, None, None],
            )
            depths = jnp.maximum(depths, near[:, :, None, None, None])
            depths = jnp.minimum(depths, far[:, :, None, None, None])
            depths = depth_to_relative_disparity(
                depths, near[:, :, None, None, None], far[:, :, None, None, None]
            )
            depths = positional_encoding(depths[..., None], cfg.num_octaves)
            depths = nn.Dense(self.d_in, dtype=self.dtype, name="depth_proj")(depths)
            kv = sampling.features + depths
        else:
            kv = sampling.features

        # Randomly permuted per-view embeddings distinguish the other views
        # when there are more than two context views.
        if v > 2:
            embed = nn.Embed(self.num_context_views, self.d_in, name="view_embeddings")
            order = (
                jax.random.permutation(shuffle_rng, v - 1)
                if shuffle_rng is not None
                else jnp.arange(v - 1)
            )
            kv = kv + embed(order)[None, None, :, None, None, :]

        q = features.reshape(b * v * h * w, 1, self.d_in)
        # kv: (b, v, ov, r, s, c) -> (b*v*r, s*ov, c), matching the
        # reference's "(b v r) (s ov) c" token layout.
        kv = kv.transpose(0, 1, 3, 4, 2, 5).reshape(
            b * v * h * w, cfg.num_samples * (v - 1), self.d_in
        )
        out = Transformer(
            dim=self.d_in,
            depth=cfg.num_layers,
            heads=cfg.num_heads,
            dim_head=cfg.d_dot,
            mlp_dim=cfg.d_mlp,
            selfatt=False,
            kv_dim=self.d_in,
            feed_forward_factory=lambda dim, mlp_dim, name: _ImageSelfAttentionFF(
                cfg.self_attention, dim, dtype=self.dtype, name=name
            ),
            dtype=self.dtype,
            name="transformer",
        )(q, z=kv, b=b, v=v, h=h, w=w)
        features = out.reshape(b, v, h, w, self.d_in)

        if cfg.downscale:
            x = features.reshape(b * v, h, w, self.d_in)
            x = nn.ConvTranspose(
                self.d_in,
                kernel_size=(cfg.downscale, cfg.downscale),
                strides=(cfg.downscale, cfg.downscale),
                padding="VALID",
                dtype=self.dtype,
                name="upscaler",
            )(x)
            y = nn.Conv(self.d_in * 2, kernel_size=(7, 7), dtype=self.dtype, name="refine1")(x)
            # Exact (erf) GELU: torch nn.GELU parity.
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.d_in, kernel_size=(7, 7), dtype=self.dtype, name="refine2")(y)
            x = x + y
            features = x.reshape(b, v, h_full, w_full, self.d_in)

        return features, sampling
