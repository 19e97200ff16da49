"""The pixelSplat encoder: context images → per-pixel 3D Gaussians.

Mirrors /root/reference/src/model/encoder/encoder_epipolar.py: backbone →
1x1 projection to d_feature → epipolar transformer → high-resolution conv
skip → monocular depth predictor → per-pixel Gaussian head → Gaussian
adapter, with the pdf→opacity warm-up mapping and per-pixel XY offsets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geometry.projection import sample_image_grid
from ...ops.rasterizer.projection import GaussiansSoA
from ..types import Gaussians
from .backbone.dino import BackboneDino, BackboneDinoCfg
from .backbone.resnet import BackboneResnet, BackboneResnetCfg
from .common.gaussian_adapter import GaussianAdapter, GaussianAdapterCfg
from .epipolar.depth_predictor_monocular import DepthPredictorMonocular
from .epipolar.epipolar_transformer import (
    EpipolarTransformer,
    EpipolarTransformerCfg,
)


@dataclass(frozen=True)
class OpacityMappingCfg:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclass(frozen=True)
class EncoderEpipolarCfg:
    name: Literal["epipolar"] = "epipolar"
    d_feature: int = 128
    num_monocular_samples: int = 32
    num_surfaces: int = 1
    predict_opacity: bool = False
    backbone: Union[BackboneResnetCfg, BackboneDinoCfg] = field(
        default_factory=BackboneResnetCfg
    )
    near_disparity: float = 3.0
    gaussian_adapter: GaussianAdapterCfg = field(default_factory=GaussianAdapterCfg)
    apply_bounds_shim: bool = True
    epipolar_transformer: EpipolarTransformerCfg = field(
        default_factory=EpipolarTransformerCfg
    )
    opacity_mapping: OpacityMappingCfg = field(default_factory=OpacityMappingCfg)
    gaussians_per_pixel: int = 3
    use_epipolar_transformer: bool = True
    use_transmittance: bool = False
    num_context_views: int = 2
    # Compute dtype policy for the matmul/conv-heavy paths (backbone,
    # epipolar transformer, heads). "bfloat16" roughly halves encoder HBM
    # traffic on TPU; parameters and the depth/Gaussian numerics stay f32.
    compute_dtype: Optional[str] = None


class EncoderEpipolar(nn.Module):
    cfg: EncoderEpipolarCfg

    def map_pdf_to_opacity(self, pdf: jax.Array, global_step: jax.Array) -> jax.Array:
        """Warm-up-scheduled exponent mapping (encoder_epipolar.py:97-110)."""
        cfg = self.cfg.opacity_mapping
        frac = jnp.minimum(global_step / cfg.warm_up, 1.0)
        x = cfg.initial + frac * (cfg.final - cfg.initial)
        exponent = 2.0**x
        return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))

    @nn.compact
    def __call__(
        self,
        context: dict,
        global_step: jax.Array,
        deterministic: bool = False,
        visualization_dump: Optional[dict] = None,
        pack_soa: bool = False,
    ) -> Union[Gaussians, "GaussiansSoA"]:
        from ...utils.shape_checks import check_context

        check_context(context)
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        image = context["image"]  # (b, v, 3, h, w)
        b, v, _, h, w = image.shape

        if isinstance(cfg.backbone, BackboneDinoCfg):
            backbone = BackboneDino(cfg.backbone, dtype=dtype, name="backbone")
        else:
            backbone = BackboneResnet(cfg.backbone, dtype=dtype, name="backbone")
        features = backbone(image)  # (b, v, h, w, c) channels-last

        features = nn.relu(features)
        features = nn.Dense(cfg.d_feature, dtype=dtype, name="backbone_projection")(features)

        sampling = None
        if cfg.use_epipolar_transformer:
            features, sampling = EpipolarTransformer(
                cfg.epipolar_transformer,
                cfg.d_feature,
                num_context_views=cfg.num_context_views,
                dtype=dtype,
                name="epipolar_transformer",
            )(
                features,
                context["extrinsics"],
                context["intrinsics"],
                context["near"],
                context["far"],
                shuffle_rng=(
                    self.make_rng("sample") if (v > 2 and not deterministic) else None
                ),
            )

        # High-resolution skip from the raw image (the only NCHW->NHWC
        # transpose left is this 3-channel input reshape).
        skip = image.reshape(b * v, 3, h, w).transpose(0, 2, 3, 1)
        skip = nn.Conv(
            cfg.d_feature, kernel_size=(7, 7), dtype=dtype, name="high_resolution_skip"
        )(skip)
        skip = nn.relu(skip)
        features = features + skip.reshape(b, v, h, w, cfg.d_feature)

        # Depths + densities per ray (channels-last: a plain reshape).
        features = features.reshape(b, v, h * w, cfg.d_feature)
        features = features.astype(jnp.float32)
        gpp = 1 if deterministic else cfg.gaussians_per_pixel
        depths, densities = DepthPredictorMonocular(
            cfg.d_feature,
            cfg.num_monocular_samples,
            cfg.num_surfaces,
            cfg.use_transmittance,
            name="depth_predictor",
        )(
            features,
            context["near"],
            context["far"],
            deterministic,
            gpp,
        )

        # Per-pixel raw Gaussian parameters.
        adapter = GaussianAdapter(cfg.gaussian_adapter)
        raw = nn.Dense(
            cfg.num_surfaces * (2 + adapter.d_in),
            name="to_gaussians",
        )(nn.relu(features))
        raw = raw.reshape(b, v, h * w, cfg.num_surfaces, 2 + adapter.d_in)

        xy_ray, _ = sample_image_grid((h, w), dtype=features.dtype)
        xy_ray = xy_ray.reshape(h * w, 1, 2)
        offset_xy = jax.nn.sigmoid(raw[..., :2])
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], features.dtype)
        xy_ray = xy_ray[None, None] + (offset_xy - 0.5) * pixel_size

        gaussians = adapter(
            context["extrinsics"][:, :, None, None, None],
            context["intrinsics"][:, :, None, None, None],
            xy_ray[:, :, :, :, None],  # (b, v, r, srf, 1, 2)
            depths,
            self.map_pdf_to_opacity(densities, global_step) / cfg.gaussians_per_pixel,
            raw[..., None, 2:],  # (b, v, r, srf, 1, d_in)
            (h, w),
        )

        if visualization_dump is not None:
            visualization_dump["depth"] = depths.reshape(
                b, v, h, w, cfg.num_surfaces, -1
            )
            visualization_dump["scales"] = gaussians.scales.reshape(b, -1, 3)
            visualization_dump["rotations"] = gaussians.rotations.reshape(b, -1, 4)
            if sampling is not None:
                visualization_dump["sampling"] = sampling

        if cfg.predict_opacity:
            opacity_mul = nn.Dense(1, name="to_opacity")(nn.relu(features))
            opacity_mul = jax.nn.sigmoid(opacity_mul)[..., None]  # (b, v, r, 1, 1)
        else:
            opacity_mul = 1.0

        g = v * (h * w) * cfg.num_surfaces * gaussians.means.shape[-2]
        if pack_soa:
            # Evaluation fast path: emit the scene directly in the
            # rasterizer's structure-of-arrays layout. Versus returning
            # the public AoS `Gaussians` and re-packing in the decoder,
            # this skips the AoS materialization of every attribute —
            # most importantly the gpp-fold repeat of the 25-coefficient
            # SH tensor, which stays sample-shared all the way into the
            # per-view SH evaluation (projection.py). The SoA g-order is
            # (v, srf, gpp, r): the sample axis must be second-outermost
            # so `harmonics` (per-ray, sample-shared) factors as
            # (V, 1, R) against it. Planes carry a leading batch axis.
            spp = gaussians.means.shape[-2]
            srf = cfg.num_surfaces

            def plane(x):  # (b, v, r, srf, spp) -> (b, g)
                x = jnp.broadcast_to(x, (b, v, h * w, srf, spp))
                return x.transpose(0, 1, 3, 4, 2).reshape(b, g)

            mean_planes = [plane(gaussians.means[..., i]) for i in range(3)]
            cov = gaussians.covariances
            cov6 = jnp.stack(
                [
                    plane(cov[..., i, j])
                    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
                ],
                axis=1,
            )  # (b, 6, g)
            # harmonics: (b, v, r, srf, 1, 3, d_sh) -> (b, 3, d_sh, V, 1, R)
            harm = gaussians.harmonics.transpose(0, 5, 6, 1, 3, 4, 2)
            harm = harm.reshape(b, 3, adapter.d_sh, v * srf, 1, h * w)
            return GaussiansSoA(
                mean_x=mean_planes[0],
                mean_y=mean_planes[1],
                mean_z=mean_planes[2],
                cov=cov6,
                opacity=plane(opacity_mul * gaussians.opacities),
                harmonics=harm,
            )
        harmonics = jnp.broadcast_to(
            gaussians.harmonics, (b, v, h * w, cfg.num_surfaces,
                                  gaussians.means.shape[-2], 3, adapter.d_sh)
        )
        return Gaussians(
            means=gaussians.means.reshape(b, g, 3),
            covariances=gaussians.covariances.reshape(b, g, 3, 3),
            harmonics=harmonics.reshape(b, g, 3, adapter.d_sh),
            opacities=(opacity_mul * gaussians.opacities).reshape(b, g),
        )
