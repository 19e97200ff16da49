"""Decoder: render Gaussians into target views via the TPU rasterizer.

Mirrors /root/reference/src/model/decoder/decoder_splatting_cuda.py, with
one TPU-minded difference: instead of materially repeating the Gaussian set
per target view (b v g ...) — gigabytes at production scale — the view axis
is a vmap with `in_axes=None` over the shared Gaussian arrays, so XLA reads
one copy.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Literal, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops.rasterizer import RenderSettings, render, render_depth
from ...ops.rasterizer.render import DepthRenderingMode
from ..types import Gaussians

# Unroll per-view rendering up to this many views (XLA overlaps the
# independent pipelines); beyond it, lax.map bounds compile time. The env
# override exists for compile-time-sensitive hosts (the multichip dryrun
# compiles the whole program on one CPU core): lax.map is the same
# program structure the production path uses past the unroll limit.
UNROLL_MAX_VIEWS = int(os.environ.get("PIXELSPLAT_UNROLL_MAX_VIEWS", "8"))


class DecoderOutput(NamedTuple):
    color: jax.Array  # (b, v, 3, h, w)
    depth: Optional[jax.Array] = None  # (b, v, h, w)
    # Total (gaussian, tile) pairs dropped by the binner at capacity over
    # all rendered views. Nonzero means the farthest Gaussians of
    # overfull tiles were silently omitted (see RenderSettings.capacity).
    overflow: Optional[jax.Array] = None  # scalar int32


@dataclass(frozen=True)
class DecoderSplattingCfg:
    name: Literal["splatting"] = "splatting"
    background_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    render: RenderSettings = RenderSettings()


class DecoderSplatting:
    """Stateless decoder (no learnable parameters)."""

    def __init__(self, cfg: DecoderSplattingCfg):
        self.cfg = cfg
        self.background_color = jnp.asarray(cfg.background_color, jnp.float32)

    def __call__(
        self,
        gaussians: Gaussians,
        extrinsics: jax.Array,  # (b, v, 4, 4)
        intrinsics: jax.Array,  # (b, v, 3, 3)
        near: jax.Array,  # (b, v)
        far: jax.Array,  # (b, v)
        image_shape: tuple[int, int],
        depth_mode: Optional[DepthRenderingMode] = None,
    ) -> DecoderOutput:
        # Sequential rendering instead of vmap: batching the
        # sort/gather-heavy rasterizer costs ~1.6x per view on TPU, and
        # the Gaussians stay broadcast (closed over) rather than copied
        # per view. Small view counts unroll (XLA overlaps the
        # independent per-view pipelines: 160 -> 141 ms for 4 views
        # fwd+bwd); larger ones use lax.map to bound compile time.
        def render_batch_element(element):
            e_v, k_v, n_v, f_v, means, covs, sh, op = element

            def render_one_view(cam):
                e, k, n, f = cam
                img, ovf = render(
                    e[None],
                    k[None],
                    n[None],
                    f[None],
                    image_shape,
                    self.background_color[None],
                    means[None],
                    covs[None],
                    sh[None],
                    op[None],
                    settings=self.cfg.render,
                    return_overflow=True,
                )
                return img[0], ovf[0]

            v = e_v.shape[0]
            if v <= UNROLL_MAX_VIEWS:
                imgs, ovfs = zip(
                    *[
                        render_one_view((e_v[i], k_v[i], n_v[i], f_v[i]))
                        for i in range(v)
                    ]
                )
                return jnp.stack(imgs), jnp.stack(ovfs)
            return jax.lax.map(render_one_view, (e_v, k_v, n_v, f_v))

        color, overflow = jax.lax.map(
            render_batch_element,
            (
                extrinsics,
                intrinsics,
                near,
                far,
                gaussians.means,
                gaussians.covariances,
                gaussians.harmonics,
                gaussians.opacities,
            ),
        )

        depth = None
        if depth_mode is not None:
            def depth_batch_element(element):
                e_v, k_v, n_v, f_v, means, covs, op = element

                def depth_one_view(cam):
                    e, k, n, f = cam
                    return render_depth(
                        e[None],
                        k[None],
                        n[None],
                        f[None],
                        image_shape,
                        means[None],
                        covs[None],
                        op[None],
                        mode=depth_mode,
                        settings=self.cfg.render,
                    )[0]

                v = e_v.shape[0]
                if v <= UNROLL_MAX_VIEWS:
                    return jnp.stack(
                        [
                            depth_one_view((e_v[i], k_v[i], n_v[i], f_v[i]))
                            for i in range(v)
                        ]
                    )

                return jax.lax.map(depth_one_view, (e_v, k_v, n_v, f_v))

            depth = jax.lax.map(
                depth_batch_element,
                (
                    extrinsics,
                    intrinsics,
                    near,
                    far,
                    gaussians.means,
                    gaussians.covariances,
                    gaussians.opacities,
                ),
            )

        return DecoderOutput(
            color=color, depth=depth, overflow=overflow.sum()
        )
