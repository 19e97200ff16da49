"""Probabilistic-sampling figure: Gaussian cloud + depth-pdf density volume.

Counterpart of /root/reference/src/paper/generate_sampling_figure.py
(:38-468): loads a trained checkpoint, encodes the figure scene while
capturing the monocular depth predictor's full pdf + offset maps (the
reference uses forward hooks on to_pdf/to_offset; here they are `sow`n
into the `intermediates` collection), then renders two figures from an
orbit camera:

  gaussians.png — frustum-trimmed Gaussians rendered orthographically with
    the first context camera's frustum wireframe composited over them.
  density.png — the predicted depth distribution visualized as a volume:
    every orbit-camera ray is sampled densely, each sample looks up the
    (subdivided, offset-masked) pdf at its projected image position and
    disparity bucket, and the per-ray max becomes the density layer that
    is depth-composited with the frustum wireframe.

Usage:
  python -m pixelsplat_tpu.paper.generate_sampling_figure \
      +experiment=re10k checkpointing.load=<ckpt> \
      [--output sampling_figure] [--scene name:c0:c1:far] \
      [--resolution 1536] [--samples-per-ray 2048]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..geometry.projection import get_world_rays, project, sample_image_grid
from ..model.encoder.epipolar.conversions import depth_to_relative_disparity
from ..ops.rasterizer import (
    RenderSettings,
    orthographic_frustum,
    render_orthographic,
)
from ..utils.image_io import save_image
from .common import (
    composite_depth_layers,
    frustum_lines,
    line_overlay_layers,
    load_model,
    load_scene,
)
from .generate_point_cloud_figure import _orbit_pose

# The published figure scene (reference :38-41).
SCENES = (("fc60dbb610046c56", 0, 115, 9.0),)
LINE_WIDTH = 3.0
LINE_COLOR = (0.0, 0.0, 0.0)
POINT_DENSITY = 1.0
ANGLE = 30.0
SUBDIVISION = 32
DENSITY_COLOR = (80.0 / 255.0,) * 3


def _find_sown(tree, name: str):
    """Depth-first search of the intermediates collection for `name`."""
    if isinstance(tree, dict):
        for key, value in tree.items():
            if key == name:
                return value[0] if isinstance(value, tuple) else value
            found = _find_sown(value, name)
            if found is not None:
                return found
    return None


def _frustum_mask(
    points: np.ndarray,  # (..., 3)
    corners: np.ndarray,  # (4, 3) far-plane corners of view 0
    origin: np.ndarray,  # (3,)
) -> np.ndarray:
    """Inside-ness against the 4 side planes + the far plane of the first
    context frustum (reference is_in_frustum, :135-155)."""
    inside = np.ones(points.shape[:-1], bool)
    for i in range(4):
        ab = corners[i - 1] - corners[i]
        ac = origin - corners[i]
        plane = np.cross(ab, ac)
        inside &= np.einsum("...i,i->...", origin - points, plane) > 0
    ab = corners[0] - corners[1]
    ac = corners[2] - corners[1]
    plane = np.cross(ac, ab)
    inside &= np.einsum("...i,i->...", corners[0] - points, plane) > 0
    return inside


def _subdivided_pdf(pdf: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """(h, w, d) pdf + offsets -> (h, w, d*SUBDIVISION) with mass placed at
    each bucket's predicted offset (reference :366-378)."""
    h, w, d = pdf.shape
    chosen = np.clip((offset * SUBDIVISION).astype(np.int64), 0, SUBDIVISION - 1)
    fine = np.zeros((h, w, d, SUBDIVISION), pdf.dtype)
    ih, iw, idx = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(d), indexing="ij"
    )
    fine[ih, iw, idx, chosen] = pdf
    return fine.reshape(h, w, d * SUBDIVISION)


def main(argv: list[str]) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=Path, default=Path("sampling_figure"))
    parser.add_argument("--scene", default=None, metavar="name:c0:c1:far")
    parser.add_argument("--resolution", type=int, default=1536)
    parser.add_argument("--samples-per-ray", type=int, default=2048)
    parser.add_argument("--capacity", type=int, default=None)
    args, overrides = parser.parse_known_args(argv)

    cfg = load_config(["+experiment=re10k", "mode=test", *overrides])
    encoder, _, variables = load_model(cfg)
    if args.scene:
        scene, c0, c1, far = args.scene.split(":")
        scenes = [(scene, int(c0), int(c1), float(far))]
    else:
        scenes = list(SCENES)
    render_cfg = cfg.model.decoder.render
    settings = RenderSettings(
        capacity=args.capacity or render_cfg.capacity,
        big_capacity=max((args.capacity or render_cfg.capacity) // 8, 32),
    )
    resolution = args.resolution

    for scene, c0, c1, far in scenes:
        example = load_scene(cfg.dataset, scene, [c0, c1], [c0, c1])
        context = {k: jnp.asarray(v) for k, v in example["context"].items()}
        gaussians, state = encoder.apply(
            variables, context, jnp.asarray(0), True, mutable=["intermediates"]
        )
        inter = state["intermediates"]
        # (b, v, ray, srf, depth) -> view 0's (h*w, depth) maps.
        pdf = np.asarray(_find_sown(inter, "pdf"))
        offset = np.asarray(_find_sown(inter, "offset"))

        b, v, _, h, w = example["context"]["image"].shape
        spp = gaussians.means.shape[1] // (v * h * w)
        pdf = pdf[0, 0, :, 0].reshape(h, w, -1)
        offset = offset[0, 0, :, 0].reshape(h, w, -1)

        # Slightly zoomed intrinsics for a cleaner frustum (:123-125).
        k = np.asarray(example["context"]["intrinsics"][0]).copy()
        k[..., :2, :2] *= 256.0 / (256.0 - 16.0)
        context_extrinsics = np.asarray(example["context"]["extrinsics"][0])

        from ..visualization.drawing.cameras import unproject_frustum_corners

        corners = np.asarray(
            unproject_frustum_corners(
                jnp.asarray(context_extrinsics),
                jnp.asarray(k),
                jnp.full((v,), far, np.float32),
            )
        )
        origins_ctx = context_extrinsics[:, :3, 3]

        # Trim to the first context frustum (:157-164).
        def to_grid(element: np.ndarray) -> np.ndarray:
            element = np.asarray(element)[0].reshape(
                v, h, w, spp, *element.shape[2:]
            )
            return np.moveaxis(element, 0, 3)

        means = to_grid(gaussians.means)
        mask = _frustum_mask(means, corners[0], origins_ctx[0])

        def trim(element) -> np.ndarray:
            return to_grid(element)[mask][None]

        render_extrinsics = _orbit_pose(context_extrinsics[0], ANGLE, far)
        ortho_args = dict(
            extrinsics=jnp.asarray(render_extrinsics)[None],
            width=jnp.asarray([far * 2.0]),
            height=jnp.asarray([far * 2.0]),
            near=jnp.asarray([0.0]),
            far=jnp.asarray([far]),
            image_shape=(resolution, resolution),
            background_color=jnp.zeros((1, 3)),
            settings=settings,
        )
        t_means = trim(gaussians.means)
        t_covariances = trim(gaussians.covariances)
        t_harmonics = trim(gaussians.harmonics)
        t_opacities = trim(gaussians.opacities)

        alpha = np.asarray(
            render_orthographic(
                gaussian_means=jnp.asarray(t_means),
                gaussian_covariances=jnp.asarray(t_covariances),
                gaussian_sh_coefficients=jnp.ones_like(
                    jnp.asarray(t_harmonics[..., 0])
                ),
                gaussian_opacities=jnp.asarray(t_opacities),
                use_sh=False,
                **ortho_args,
            )[0]
        )
        color = np.asarray(
            render_orthographic(
                gaussian_means=jnp.asarray(t_means),
                gaussian_covariances=jnp.asarray(t_covariances),
                gaussian_sh_coefficients=jnp.asarray(t_harmonics),
                gaussian_opacities=jnp.asarray(t_opacities),
                **ortho_args,
            )[0]
        )
        frustum = orthographic_frustum(
            ortho_args["extrinsics"],
            ortho_args["width"],
            ortho_args["height"],
            ortho_args["near"],
            ortho_args["far"],
        )
        view_extrinsics = np.asarray(frustum[0][0])
        view_intrinsics = np.asarray(frustum[1][0])
        view_near = float(frustum[2][0])
        view_far = float(frustum[3][0])
        depth_vals = np.linalg.norm(t_means[0] - view_extrinsics[:3, 3], axis=-1)
        depth_premultiplied = np.asarray(
            render_orthographic(
                gaussian_means=jnp.asarray(t_means),
                gaussian_covariances=jnp.asarray(t_covariances),
                gaussian_sh_coefficients=jnp.asarray(
                    np.repeat(depth_vals[None, :, None], 3, axis=2)
                ),
                gaussian_opacities=jnp.asarray(t_opacities),
                use_sh=False,
                **ortho_args,
            )[0]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            depth = np.nan_to_num(depth_premultiplied / alpha, nan=1e10, posinf=1e10)

        # Only the first context frustum is drawn (:229-249).
        lines = frustum_lines(
            context_extrinsics, k, np.full((v,), far, np.float32), max_views=1
        )
        line_layers = line_overlay_layers(
            lines,
            view_extrinsics,
            view_intrinsics,
            (resolution, resolution),
            LINE_WIDTH,
            LINE_COLOR,
            POINT_DENSITY,
        )
        image = composite_depth_layers(
            [(color, alpha, depth)] + line_layers, np.ones_like(color)
        )
        save_image(image, args.output / "gaussians.png")
        print(f"Wrote {args.output / 'gaussians.png'}")

        # --- density volume (:356-462) ---
        fine_pdf = _subdivided_pdf(pdf, offset)
        n_fine = fine_pdf.shape[-1]
        extr0 = np.asarray(example["context"]["extrinsics"][0, 0])
        intr0 = np.asarray(example["context"]["intrinsics"][0, 0])
        near0 = float(example["context"]["near"][0, 0])
        far0 = float(example["context"]["far"][0, 0])

        xy, _ = sample_image_grid((resolution, resolution))
        origins, directions = np.asarray(
            get_world_rays(
                xy, jnp.asarray(view_extrinsics), jnp.asarray(view_intrinsics)
            )
        ).reshape(2, resolution * resolution, 3)
        t = np.linspace(0.0, 1.0, args.samples_per_ray, dtype=np.float32)
        t = t * ((view_far + 10.0) - (view_near - 10.0)) + (view_near - 10.0)

        fine_pdf_j = jnp.asarray(fine_pdf)
        corners0 = jnp.asarray(corners[0])
        origin0 = jnp.asarray(origins_ctx[0])

        @jax.jit
        def density_chunk(r_o, r_d):
            xyz = r_o[:, None] + r_d[:, None] * jnp.asarray(t)[None, :, None]
            dpt = jnp.linalg.norm(xyz - jnp.asarray(extr0)[:3, 3], axis=-1)
            dpt = depth_to_relative_disparity(dpt, near0, far0)
            img_xy, in_front = project(
                xyz, jnp.asarray(extr0), jnp.asarray(intr0)
            )
            valid = (
                in_front
                & (dpt > 0)
                & (dpt < 1)
                & (img_xy > 0).all(-1)
                & (img_xy < 1).all(-1)
            )
            dpt_bucket = jnp.clip((dpt * n_fine).astype(jnp.int32), 0, n_fine - 1)
            x_bucket = jnp.clip((img_xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
            y_bucket = jnp.clip((img_xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
            sampled = fine_pdf_j[y_bucket, x_bucket, dpt_bucket]

            inside = jnp.ones(xyz.shape[:-1], bool)
            for i in range(4):
                ab = corners0[i - 1] - corners0[i]
                ac = origin0 - corners0[i]
                plane = jnp.cross(ab, ac)
                inside &= jnp.einsum("...i,i->...", origin0 - xyz, plane) > 0
            ab = corners0[0] - corners0[1]
            ac = corners0[2] - corners0[1]
            plane = jnp.cross(ac, ab)
            inside &= jnp.einsum("...i,i->...", corners0[0] - xyz, plane) > 0

            density = sampled * valid * inside
            # "just take the max" (:420-423) instead of volume rendering.
            result = density.max(-1)
            i_depth = density.argmax(-1)
            sample_depth = jnp.asarray(t)[i_depth] + 0.01  # line wins ties
            sample_depth = jnp.where(result < 0.05, 1e20, sample_depth)
            return result, sample_depth

        chunk = 4096
        density_rows, depth_rows = [], []
        for start in range(0, origins.shape[0], chunk):
            r_o = origins[start : start + chunk]
            r_d = directions[start : start + chunk]
            pad = chunk - r_o.shape[0]
            if pad:
                r_o = np.pad(r_o, ((0, pad), (0, 0)))
                r_d = np.pad(r_d, ((0, pad), (0, 0)), constant_values=1.0)
            res, dep = density_chunk(jnp.asarray(r_o), jnp.asarray(r_d))
            density_rows.append(np.asarray(res)[: chunk - pad if pad else chunk])
            depth_rows.append(np.asarray(dep)[: chunk - pad if pad else chunk])
        rendered_density = np.concatenate(density_rows).reshape(
            resolution, resolution
        )
        rendered_depth = np.concatenate(depth_rows).reshape(resolution, resolution)
        rendered_density = np.repeat(rendered_density[None], 3, axis=0)
        rendered_depth = np.repeat(rendered_depth[None], 3, axis=0)

        density_layer = (
            np.broadcast_to(
                np.asarray(DENSITY_COLOR, np.float32)[:, None, None],
                rendered_density.shape,
            ),
            rendered_density,
            rendered_depth,
        )
        image = composite_depth_layers(
            [density_layer] + line_layers, np.ones_like(color)
        )
        save_image(image, args.output / "density.png")
        print(f"Wrote {args.output / 'density.png'}")


if __name__ == "__main__":
    main(sys.argv[1:])
