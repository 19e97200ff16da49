"""Gaussian point-cloud figures: orthographic renders with camera frusta.

Counterpart of /root/reference/src/paper/generate_point_cloud_figure.py
(:38-317): loads a trained checkpoint, encodes each listed scene, trims
border/far Gaussians, renders them orthographically (alpha, color, and
straight-alpha depth passes), depth-composites camera-frustum wireframes
over the render, exports a .ply of the trimmed Gaussians, and writes
turbo-mapped context-view depth renders.

Usage:
  python -m pixelsplat_tpu.paper.generate_point_cloud_figure \
      +experiment=re10k checkpointing.load=<ckpt> \
      [--output point_clouds] [--scene name:c0:c1:far:angle] [--resolution N]

Without --scene, the reference's published scene list is used.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from ..config import load_config
from ..model.ply_export import export_ply
from ..ops.rasterizer import (
    RenderSettings,
    orthographic_frustum,
    render_orthographic,
)
from ..utils.image_io import save_image
from ..visualization.color_map import apply_color_map_to_image
from .common import (
    composite_depth_layers,
    frustum_lines,
    line_overlay_layers,
    load_model,
    load_scene,
)

# scene, context 1, context 2, far plane, angles — the published figure
# scenes (reference :35-44).
SCENES = (
    ("2c52d9d606a3ece2", 87, 112, 35.0, (105,)),
    ("71a1121f817eb913", 139, 164, 10.0, (65,)),
    ("d70fc3bef87bffc1", 67, 92, 10.0, (60,)),
    ("f0feab036acd7195", 44, 69, 25.0, (125,)),
    ("a93d9d0fd69071aa", 57, 82, 15.0, (60,)),
)
GAUSSIAN_TRIM = 8
LINE_WIDTH = 2.0
LINE_COLOR = (0.0, 0.0, 0.0)
POINT_DENSITY = 0.5


def _parse_scene(spec: str):
    scene, c0, c1, far, angle = spec.split(":")
    return scene, int(c0), int(c1), float(far), (float(angle),)


def _orbit_pose(context_extrinsics: np.ndarray, angle: float, far: float):
    """The render camera: context-view frame rotated by `angle` about y,
    pitched -15 degrees, pushed back for visual balance (reference
    :130-138)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.from_euler("xyz", [-15.0, angle - 90.0, 0.0], True).as_matrix()
    translation = np.eye(4, dtype=np.float32)
    translation[2, 3] = far * 0.5 ** (1.0 / 3.0)  # 0.5x frustum volume
    return context_extrinsics @ (translation @ pose)


def generate_scene_figure(
    encoder,
    decoder,
    variables,
    example: dict,
    scene: str,
    far: float,
    angles,
    out_root: Path,
    idx: int,
    resolution: int,
    settings: RenderSettings,
) -> list[Path]:
    context = {k: jnp.asarray(v) for k, v in example["context"].items()}
    visualization_dump: dict = {}
    gaussians = encoder.apply(
        variables,
        context,
        jnp.asarray(0),
        True,
        visualization_dump=visualization_dump,
    )

    b, v, _, h, w = example["context"]["image"].shape
    spp = gaussians.means.shape[1] // (v * h * w)

    # Trim low-quality border Gaussians and Gaussians beyond the far plane,
    # measured in the first context camera's space (reference :105-128).
    def to_grid(element: np.ndarray) -> np.ndarray:
        element = np.asarray(element)[0].reshape(v, h, w, spp, *element.shape[2:])
        return np.moveaxis(element, 0, 3)  # (h, w, spp, v, ...)

    means = to_grid(gaussians.means)
    w2c = np.linalg.inv(np.asarray(example["context"]["extrinsics"][0]))
    cam_means = np.einsum(
        "vij,hwsvj->hwsvi", w2c[:, :3, :3], means
    ) + w2c[:, :3, 3]
    mask = np.zeros(means.shape[:-1], bool)
    mask[GAUSSIAN_TRIM:-GAUSSIAN_TRIM, GAUSSIAN_TRIM:-GAUSSIAN_TRIM] = True
    mask &= cam_means[..., 2] < far

    def trim(element) -> np.ndarray:
        return to_grid(element)[mask][None]

    t_means = trim(gaussians.means)
    t_covariances = trim(gaussians.covariances)
    t_harmonics = trim(gaussians.harmonics)
    t_opacities = trim(gaussians.opacities)

    context_extrinsics = np.asarray(example["context"]["extrinsics"][0])
    context_intrinsics = np.asarray(example["context"]["intrinsics"][0])
    written = []
    base = out_root / f"{idx:0>6}_{scene}"

    for angle in angles:
        render_extrinsics = _orbit_pose(context_extrinsics[0], angle, far)
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

        # Alpha pass: constant-1 "colors" without SH (reference :157-166).
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

        # Straight-alpha depth from a premultiplied depth pass (:171-182).
        frustum = orthographic_frustum(
            ortho_args["extrinsics"],
            ortho_args["width"],
            ortho_args["height"],
            ortho_args["near"],
            ortho_args["far"],
        )
        view_extrinsics = np.asarray(frustum[0][0])
        view_intrinsics = np.asarray(frustum[1][0])
        depth_vals = np.linalg.norm(
            t_means[0] - view_extrinsics[:3, 3], axis=-1
        )
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

        # Camera-frustum wireframe, occluded by the Gaussians (:195-261).
        lines = frustum_lines(
            context_extrinsics,
            context_intrinsics,
            np.full((v,), far / 8.0, np.float32),
        )
        layers = [(color, alpha, depth)]
        layers += line_overlay_layers(
            lines,
            view_extrinsics,
            view_intrinsics,
            (resolution, resolution),
            LINE_WIDTH,
            LINE_COLOR,
            POINT_DENSITY,
        )
        image = composite_depth_layers(layers, np.ones_like(color))
        path = Path(f"{base}_angle_{angle:0>3}.png")
        save_image(image, path)
        written.append(path)

    # .ply export of the trimmed Gaussians (:292-300).
    export_ply(
        context_extrinsics[0],
        t_means[0],
        trim(visualization_dump["scales"])[0],
        trim(visualization_dump["rotations"])[0],
        t_harmonics[0],
        t_opacities[0],
        base / "gaussians.ply",
    )
    written.append(base / "gaussians.ply")

    # Turbo-mapped context-view depth renders (:280-308).
    rendered = decoder(
        gaussians,
        jnp.asarray(example["context"]["extrinsics"]),
        jnp.asarray(example["context"]["intrinsics"]),
        jnp.asarray(example["context"]["near"]),
        jnp.asarray(example["context"]["far"]),
        (h, w),
        "depth",
    )
    result = np.asarray(rendered.depth)
    depth_near = np.log(np.quantile(result[result > 0], 0.01))
    depth_far = np.log(np.quantile(result, 0.99))
    result = 1.0 - (np.log(np.maximum(result, 1e-10)) - depth_near) / (
        depth_far - depth_near
    )
    for view in range(v):
        mapped = apply_color_map_to_image(result[0, view], "turbo")
        path = Path(f"{base}_depth_{view}.png")
        save_image(mapped, path)
        written.append(path)
    return written


def main(argv: list[str]) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=Path, default=Path("point_clouds"))
    parser.add_argument(
        "--scene",
        action="append",
        default=None,
        metavar="name:c0:c1:far:angle",
        help="override the published scene list (repeatable)",
    )
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--capacity", type=int, default=None)
    args, overrides = parser.parse_known_args(argv)

    cfg = load_config(["+experiment=re10k", "mode=test", *overrides])
    encoder, decoder, variables = load_model(cfg)
    scenes = (
        [_parse_scene(s) for s in args.scene] if args.scene else list(SCENES)
    )
    render = cfg.model.decoder.render
    settings = RenderSettings(
        capacity=args.capacity or render.capacity,
        big_capacity=max((args.capacity or render.capacity) // 8, 32),
    )

    for idx, (scene, c0, c1, far, angles) in enumerate(scenes):
        example = load_scene(cfg.dataset, scene, [c0, c1], [c0, c1])
        written = generate_scene_figure(
            encoder,
            decoder,
            variables,
            example,
            scene,
            far,
            angles,
            args.output,
            idx,
            args.resolution,
            settings,
        )
        for path in written:
            print(f"Wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
