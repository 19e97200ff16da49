"""ResNet backbone in Flax with multi-scale feature fusion.

Mirrors /root/reference/src/model/encoder/backbone/backbone_resnet.py:
a torchvision-style ResNet, per-stage 1x1 projections to d_out, bilinear
(align_corners=True) upsample of every stage to full resolution, and a sum.

Norm semantics follow the reference: models constructed from torchvision
use parameter-free InstanceNorm (affine=False, no running stats); the
"dino_resnet50" variant is the torch-hub DINO model whose BatchNorm layers
carry pretrained scale/bias/running stats — represented here as frozen
parameters applied in inference mode (norm_mode="batch"), which is what
weight import needs for parity.

Note the reference's maxpool quirk: `use_first_pool` is only consulted for
index 0 inside a loop that starts at 1, so the pool is never applied; we
honor the flag faithfully (configs ship with use_first_pool: false), and
when false the spatial strides match the reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import flax.linen as nn

# Compute dtype for convolutions (params stay f32); set by BackboneResnet
# from the encoder's bf16 policy via a module attribute.

import jax
import jax.numpy as jnp
import numpy as np

RESNET_SPECS: dict[str, tuple[str, tuple[int, ...]]] = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
    "dino_resnet50": ("bottleneck", (3, 4, 6, 3)),
}


@dataclass(frozen=True)
class BackboneResnetCfg:
    name: Literal["resnet"] = "resnet"
    model: str = "resnet50"
    num_layers: int = 5
    use_first_pool: bool = False
    d_out: int = 512


class Norm(nn.Module):
    """InstanceNorm (parameter-free) or frozen inference-mode BatchNorm."""

    mode: str  # "instance" | "batch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)  # normalize in f32 regardless of policy
        if self.mode == "instance":
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    norm_mode: str = "instance"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        norm = lambda name: Norm(self.norm_mode, name=name)
        residual = x
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=self.stride,
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels,
                (1, 1),
                strides=self.stride,
                use_bias=False,
                dtype=self.dtype,
                name="downsample",
            )(x)
            residual = norm("bn_ds")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    channels: int  # internal width; output is channels * 4
    stride: int = 1
    norm_mode: str = "instance"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        norm = lambda name: Norm(self.norm_mode, name=name)
        out_ch = self.channels * 4
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=self.stride,
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(
                out_ch,
                (1, 1),
                strides=self.stride,
                use_bias=False,
                dtype=self.dtype,
                name="downsample",
            )(x)
            residual = norm("bn_ds")(residual)
        return nn.relu(y + residual)


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense align_corners=True bilinear interpolation matrix (n_out, n_in)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = (coords - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return m


def _bilinear_resize(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """align_corners=True bilinear resize (matches the reference's
    F.interpolate(..., align_corners=True)).

    Implemented as two compile-time-constant matrix contractions on the
    MXU; the gather-based formulation cost ~0.8 ms per scale per axis on
    TPU for the backbone's (2, h, w, 512) feature maps.
    """
    b, h, w, c = x.shape
    h_out, w_out = shape
    if (h, w) == (h_out, w_out):
        return x
    if h != h_out:
        mh = jnp.asarray(_resize_matrix(h, h_out))
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=jax.lax.Precision.HIGHEST)
    if w != w_out:
        mw = jnp.asarray(_resize_matrix(w, w_out))
        x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


def _resize_and_sum(features: list[jax.Array], shape: tuple[int, int]) -> jax.Array:
    """sum(_bilinear_resize(f, shape) for f in features), fused.

    Each stage is h-contracted to its SMALL width first, the partial
    results concatenate along w, and one stacked w-contraction performs
    every stage's w-resize plus the pyramid sum in a single MXU pass —
    the full-resolution (b, h, w, c) tensor is written once instead of
    once per stage plus a sum (measured 4.3 -> 2.3 ms for the resnet50
    pyramid at 256^2 x 512 on v5e).

    Precision is DEFAULT: on TPU the resize contractions lower to
    one-pass bf16 MXU matmuls with f32 accumulation (measured 7.25 ->
    4.88 ms for the full pyramid, tools/bench_pyramid.py; rel err
    4.7e-3 on features that feed ReLU->Dense, matching what DEFAULT
    already does to every conv in the backbone). On CPU the flag is a
    no-op (always f32), so golden parity tests are unaffected.
    """
    h_out, w_out = shape
    prec = jax.lax.Precision.DEFAULT
    exact = [f for f in features if f.shape[1:3] == (h_out, w_out)]
    rest = [f for f in features if f.shape[1:3] != (h_out, w_out)]
    if not rest:
        return sum(exact)
    cols, mats = [], []
    for f in rest:
        _, h, w, _ = f.shape
        y = f
        if h != h_out:
            mh = jnp.asarray(_resize_matrix(h, h_out))
            y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=prec)
        cols.append(y)
        mats.append(_resize_matrix(w, w_out))
    xcat = jnp.concatenate(cols, axis=2)
    mcat = jnp.asarray(np.concatenate(mats, axis=1))
    fused = jnp.einsum("ow,bhwc->bhoc", mcat, xcat, precision=prec)
    for f in exact:
        fused = fused + f
    return fused


class BackboneResnet(nn.Module):
    cfg: BackboneResnetCfg
    dtype: object = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (b, v, 3, h, w) -> (b, v, h, w, d_out).

        Channels-last output: the whole encoder pipeline runs NHWC (the
        TPU-native conv layout); the reference's NCHW boundary transposes
        cost ~7 ms each at (2, 256, 256, 512).
        """
        cfg = self.cfg
        block_kind, stage_sizes = RESNET_SPECS[cfg.model]
        block = BasicBlock if block_kind == "basic" else Bottleneck
        norm_mode = "batch" if cfg.model == "dino_resnet50" else "instance"
        b, v, _, h, w = images.shape
        x = images.reshape(b * v, 3, h, w).transpose(0, 2, 3, 1)  # NHWC

        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(Norm(norm_mode, name="bn1")(x))
        features = [nn.Conv(cfg.d_out, (1, 1), name="projection0")(x)]

        widths = (64, 128, 256, 512)
        for stage in range(1, cfg.num_layers):
            if stage == 1:
                if cfg.use_first_pool:
                    x = nn.max_pool(
                        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                    )
                stride = 1
            else:
                stride = 2
            for i in range(stage_sizes[stage - 1]):
                x = block(
                    widths[stage - 1],
                    stride=stride if i == 0 else 1,
                    norm_mode=norm_mode,
                    dtype=self.dtype,
                    name=f"layer{stage}_block{i}",
                )(x)
            features.append(nn.Conv(cfg.d_out, (1, 1), name=f"projection{stage}")(x))

        fused = _resize_and_sum(features, (h, w))
        return fused.reshape(b, v, h, w, cfg.d_out)

    @property
    def d_out(self) -> int:
        return self.cfg.d_out
