"""Torch checkpoint import: published pixelSplat weights → Flax params.

The published re10k.ckpt / acid.ckpt (Lightning checkpoints of
/root/reference's ModelWrapper) carry a torch `state_dict` whose module
tree this maps onto our Flax parameter tree, so parity evaluation against
the reference numbers (BASELINE.md) can load the original weights.

Layout conversions (validated numerically in tests/test_torch_import.py):
  Linear   weight (out, in)            -> Dense kernel (in, out)
  Conv2d   weight (out, in, kh, kw)    -> Conv kernel (kh, kw, in, out)
  ConvT2d  weight (in, out, kh, kw)    -> ConvTranspose kernel, flipped
  LayerNorm / BatchNorm                -> scale/bias (+ frozen mean/var)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def _j(prefix: str, suffix: str) -> str:
    return f"{prefix}.{suffix}" if prefix else suffix


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[_j(prefix, "weight")]).T}
    if bias and _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def convert_conv(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    w = _np(sd[_j(prefix, "weight")]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if bias and _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def convert_conv_transpose(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    # torch ConvTranspose2d weight: (in, out, kh, kw). Flax ConvTranspose
    # computes a fractionally-strided correlation, which equals torch's
    # transposed convolution with the kernel spatially flipped.
    w = _np(sd[_j(prefix, "weight")]).transpose(2, 3, 0, 1)
    w = w[::-1, ::-1].copy()
    out = {"kernel": w}
    if bias and _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def convert_layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[_j(prefix, "weight")]), "bias": _np(sd[_j(prefix, "bias")])}


def convert_batchnorm(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(sd[_j(prefix, "weight")]),
        "bias": _np(sd[_j(prefix, "bias")]),
        "mean": _np(sd[_j(prefix, "running_mean")]),
        "var": _np(sd[_j(prefix, "running_var")]),
    }


# ---------------------------------------------------------------------------
# Transformer stack (srt-style; reference src/model/transformer/*)


def convert_attention(sd: Mapping, prefix: str, selfatt: bool) -> dict:
    out: dict = {}
    if selfatt:
        out["to_qkv"] = convert_linear(sd, _j(prefix, "to_qkv"), bias=False)
    else:
        out["to_q"] = convert_linear(sd, _j(prefix, "to_q"), bias=False)
        out["to_kv"] = convert_linear(sd, _j(prefix, "to_kv"), bias=False)
    if _j(prefix, "to_out.0.weight") in sd:
        out["to_out"] = convert_linear(sd, _j(prefix, "to_out.0"))
    return out


def convert_feed_forward(sd: Mapping, prefix: str) -> dict:
    return {
        "fc1": convert_linear(sd, _j(prefix, "net.0")),
        "fc2": convert_linear(sd, _j(prefix, "net.3")),
    }


def convert_transformer(
    sd: Mapping,
    prefix: str,
    depth: int,
    selfatt: bool = True,
    ff_converter=None,
) -> dict:
    """Reference Transformer: layers.N.0 = PreNorm(Attention),
    layers.N.1 = PreNorm(FeedForward-or-wrapper)."""
    out: dict = {}
    for i in range(depth):
        out[f"attn_norm_{i}"] = convert_layernorm(sd, _j(prefix, f"layers.{i}.0.norm"))
        out[f"attn_{i}"] = convert_attention(
            sd, _j(prefix, f"layers.{i}.0.fn"), selfatt
        )
        out[f"ff_norm_{i}"] = convert_layernorm(sd, _j(prefix, f"layers.{i}.1.norm"))
        fn_prefix = _j(prefix, f"layers.{i}.1.fn")
        if ff_converter is None:
            out[f"ff_{i}"] = convert_feed_forward(sd, fn_prefix)
        else:
            out[f"ff_{i}"] = ff_converter(sd, fn_prefix)
    return out


def convert_image_self_attention(sd: Mapping, prefix: str, depth: int) -> dict:
    return {
        "patch_embedder": convert_conv(sd, _j(prefix, "patch_embedder.0")),
        "pe_proj": convert_linear(sd, _j(prefix, "positional_encoding.1")),
        "transformer": convert_transformer(
            sd, _j(prefix, "transformer"), depth, selfatt=True
        ),
        "resampler": convert_conv_transpose(sd, _j(prefix, "resampler")),
    }


# ---------------------------------------------------------------------------
# Backbones


def convert_resnet(
    sd: Mapping,
    prefix: str,
    model: str,
    num_layers: int,
    include_projections: bool = True,
) -> dict:
    """Reference BackboneResnet: model.* (torchvision/dino resnet) +
    projections.layerN 1x1 convs. `include_projections=False` converts
    only the torchvision trunk (for raw hub checkpoints, which have no
    pixelSplat projection heads)."""
    from ..model.encoder.backbone.resnet import RESNET_SPECS

    block_kind, stage_sizes = RESNET_SPECS[model]
    has_bn_params = f"{prefix}.model.bn1.weight" in sd
    out: dict = {
        "conv1": convert_conv(sd, f"{prefix}.model.conv1", bias=False),
    }
    if include_projections:
        out["projection0"] = convert_conv(sd, f"{prefix}.projections.layer0")
    if has_bn_params:
        out["bn1"] = convert_batchnorm(sd, f"{prefix}.model.bn1")

    def block_names(i):
        if block_kind == "basic":
            return ["conv1", "conv2"], ["bn1", "bn2"]
        return ["conv1", "conv2", "conv3"], ["bn1", "bn2", "bn3"]

    for stage in range(1, num_layers):
        for i in range(stage_sizes[stage - 1]):
            tp = f"{prefix}.model.layer{stage}.{i}"
            convs, bns = block_names(i)
            blk: dict = {}
            for conv_name, bn_name in zip(convs, bns):
                blk[conv_name] = convert_conv(sd, f"{tp}.{conv_name}", bias=False)
                if has_bn_params:
                    blk[bn_name] = convert_batchnorm(sd, f"{tp}.{bn_name}")
            if f"{tp}.downsample.0.weight" in sd:
                blk["downsample"] = convert_conv(sd, f"{tp}.downsample.0", bias=False)
                if has_bn_params:
                    blk["bn_ds"] = convert_batchnorm(sd, f"{tp}.downsample.1")
            out[f"layer{stage}_block{i}"] = blk
        if include_projections:
            out[f"projection{stage}"] = convert_conv(
                sd, f"{prefix}.projections.layer{stage}"
            )
    return out


def convert_dino_vit(sd: Mapping, prefix: str, depth: int, dim: int, heads: int) -> dict:
    """facebookresearch/dino VisionTransformer -> DinoViT params.

    The Flax DinoViT scans over its identical blocks, so the per-block
    torch tensors stack along a leading depth axis under one "blocks"
    subtree (the nn.scan parameter layout).
    """
    out: dict = {
        "patch_embed": convert_conv(sd, f"{prefix}.patch_embed.proj"),
        "cls_token": _np(sd[f"{prefix}.cls_token"]),
        "pos_embed": _np(sd[f"{prefix}.pos_embed"]),
        "norm": convert_layernorm(sd, f"{prefix}.norm"),
    }
    head_dim = dim // heads
    blocks = []
    for i in range(depth):
        bp = f"{prefix}.blocks.{i}"
        qkv_w = _np(sd[f"{bp}.attn.qkv.weight"])  # (3*dim, dim)
        qkv_b = _np(sd[f"{bp}.attn.qkv.bias"])
        proj_w = _np(sd[f"{bp}.attn.proj.weight"])
        proj_b = _np(sd[f"{bp}.attn.proj.bias"])

        def split(mat, k):
            w = mat[k * dim : (k + 1) * dim]  # (dim, dim) rows=outputs
            return w.T.reshape(dim, heads, head_dim)

        def split_b(vec, k):
            return vec[k * dim : (k + 1) * dim].reshape(heads, head_dim)

        blocks.append({
            "norm1": convert_layernorm(sd, f"{bp}.norm1"),
            "attn": {
                "query": {"kernel": split(qkv_w, 0), "bias": split_b(qkv_b, 0)},
                "key": {"kernel": split(qkv_w, 1), "bias": split_b(qkv_b, 1)},
                "value": {"kernel": split(qkv_w, 2), "bias": split_b(qkv_b, 2)},
                "out": {
                    "kernel": proj_w.T.reshape(heads, head_dim, dim),
                    "bias": proj_b,
                },
            },
            "norm2": convert_layernorm(sd, f"{bp}.norm2"),
            "mlp_fc1": convert_linear(sd, f"{bp}.mlp.fc1"),
            "mlp_fc2": convert_linear(sd, f"{bp}.mlp.fc2"),
        })
    out["blocks"] = _stack_trees(blocks)
    return out


def _stack_trees(trees: list) -> dict:
    """Stack identical-structure nested dicts of arrays along axis 0."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees)


# ---------------------------------------------------------------------------
# Full encoder


def convert_encoder(sd: Mapping, cfg) -> dict:
    """Reference EncoderEpipolar state_dict -> EncoderEpipolar Flax params.

    `sd` keys are relative to the encoder (strip "encoder." from the
    Lightning checkpoint first).
    """
    from ..model.encoder.backbone.dino import VIT_SPECS, BackboneDinoCfg
    from ..model.encoder.backbone.resnet import BackboneResnetCfg

    out: dict = {}

    if isinstance(cfg.backbone, BackboneDinoCfg):
        spec = VIT_SPECS[cfg.backbone.model]
        out["backbone"] = {
            "dino": convert_dino_vit(
                sd, "backbone.dino", spec["depth"], spec["dim"], spec["heads"]
            ),
            "resnet_backbone": convert_resnet(
                sd, "backbone.resnet_backbone", "dino_resnet50", 4
            ),
            "global_token_fc1": convert_linear(sd, "backbone.global_token_mlp.0"),
            "global_token_fc2": convert_linear(sd, "backbone.global_token_mlp.2"),
            "local_token_fc1": convert_linear(sd, "backbone.local_token_mlp.0"),
            "local_token_fc2": convert_linear(sd, "backbone.local_token_mlp.2"),
        }
    else:
        out["backbone"] = convert_resnet(
            sd, "backbone", cfg.backbone.model, cfg.backbone.num_layers
        )

    out["backbone_projection"] = convert_linear(sd, "backbone_projection.1")
    out["high_resolution_skip"] = convert_conv(sd, "high_resolution_skip.0")
    out["to_gaussians"] = convert_linear(sd, "to_gaussians.1")
    out["depth_predictor"] = {
        "projection": convert_linear(sd, "depth_predictor.projection.1")
    }

    if cfg.use_epipolar_transformer:
        et = cfg.epipolar_transformer
        sa_depth = et.self_attention.num_layers

        def ff_converter(sd_, fn_prefix):
            return {
                "self_attention": convert_image_self_attention(
                    sd_, f"{fn_prefix}.self_attention", sa_depth
                )
            }

        ep: dict = {
            "transformer": convert_transformer(
                sd,
                "epipolar_transformer.transformer",
                et.num_layers,
                selfatt=False,
                ff_converter=ff_converter,
            ),
        }
        if et.num_octaves > 0:
            ep["depth_proj"] = convert_linear(sd, "epipolar_transformer.depth_encoding.1")
        if et.downscale:
            ep["downscaler"] = convert_conv(sd, "epipolar_transformer.downscaler")
            ep["upscaler"] = convert_conv_transpose(sd, "epipolar_transformer.upscaler")
            ep["refine1"] = convert_conv(sd, "epipolar_transformer.upscale_refinement.0")
            ep["refine2"] = convert_conv(sd, "epipolar_transformer.upscale_refinement.2")
        if "epipolar_transformer.view_embeddings.weight" in sd:
            ep["view_embeddings"] = {
                "embedding": _np(sd["epipolar_transformer.view_embeddings.weight"])
            }
        out["epipolar_transformer"] = ep

    if cfg.predict_opacity:
        out["to_opacity"] = convert_linear(sd, "to_opacity.1")
    return out


def load_lightning_checkpoint(path: Path, cfg) -> dict:
    """Load a reference .ckpt and return {"params": encoder_params}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    encoder_sd = {
        k[len("encoder.") :]: v for k, v in sd.items() if k.startswith("encoder.")
    }
    import jax.numpy as jnp

    params = convert_encoder(encoder_sd, cfg)
    params = _tree_to_jnp(params)
    return {"params": params}


def _tree_to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def convert_lpips(sd: Mapping) -> dict:
    """lpips-package LPIPS(net="vgg") state_dict -> our LPIPS params."""
    from ..evaluation.lpips import _TAPS, _VGG16_PLAN

    # torchvision VGG16 feature indices of the conv layers in order.
    tv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: dict = {"vgg": {}}
    for i, tv_idx in enumerate(tv_indices):
        key = f"net.slice{_slice_of(i)}.{tv_idx}"
        # lpips stores the VGG as net.sliceN sequential modules keyed by the
        # torchvision index.
        params["vgg"][f"conv{i}"] = {
            "kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{key}.bias"]),
        }
    for i in range(len(_TAPS)):
        params[f"lin{i}"] = {
            "kernel": _np(sd[f"lins.{i}.model.1.weight"]).transpose(2, 3, 1, 0)
        }
    return {"params": params}


def _slice_of(conv_index: int) -> int:
    # lpips vgg slices: slice1 convs 0-1, slice2 2-3, slice3 4-6,
    # slice4 7-9, slice5 10-12.
    bounds = [2, 4, 7, 10, 13]
    for s, b in enumerate(bounds, start=1):
        if conv_index < b:
            return s
    raise ValueError(conv_index)
