"""Shared helpers for the paper figure generators.

Counterpart of /root/reference/src/paper/common.py — the reference embeds
base64 PNGs into SVG documents and measures them with inkscape; here the
SVG is written with a small dependency-free builder (no inkscape in the
image), and figures can equally be saved as PNG via utils.image_io.

Beyond the SVG builder, this module holds the checkpoint/scene plumbing
the reference repeats at the top of every figure script
(generate_point_cloud_figure.py:53-97 etc.): load a trained model, pin
the dataset to one scene with an arbitrary view sampler, and the
depth-sorted alpha compositing used to blend render + overlay layers.
"""

from __future__ import annotations

import base64
import dataclasses
from io import BytesIO
from pathlib import Path

import numpy as np

MARGIN = 2


# ---------------------------------------------------------------------------
# Checkpoint / scene plumbing
# ---------------------------------------------------------------------------


def load_model(cfg):
    """Build the encoder + decoder and load trained parameters.

    `cfg.checkpointing.load` may be an orbax checkpoint directory (ours) or
    a Lightning `.ckpt` (the reference's published format, imported through
    interop.torch_import). Counterpart of the reference's
    `ModelWrapper.load_from_checkpoint` preamble in every figure script.
    Returns (encoder, decoder, variables).
    """
    from ..model.decoder import get_decoder
    from ..model.encoder import get_encoder
    from ..utils.wandb_tools import update_checkpoint_path

    assert cfg.checkpointing.load is not None, "figure scripts need checkpointing.load"
    ckpt = Path(update_checkpoint_path(cfg.checkpointing.load, cfg.wandb))
    encoder, _ = get_encoder(cfg.model.encoder)
    decoder = get_decoder(cfg.model.decoder)

    if ckpt.is_dir():
        from ..training.checkpoint import load_checkpoint

        state = load_checkpoint(ckpt)
        params = state["params"] if isinstance(state, dict) else state.params
        if "params" in params:
            params = params["params"]
        variables = {"params": params}
    else:
        from ..interop.torch_import import load_lightning_checkpoint

        variables = load_lightning_checkpoint(ckpt, cfg.model.encoder)
    return encoder, decoder, variables


def load_scene(
    dataset_cfg,
    scene: str,
    context_indices: list[int],
    target_indices: list[int],
    stage: str = "test",
) -> dict:
    """One batched example of `scene` at the given view indices.

    Mirrors the reference's per-scene dataset override
    (ViewSamplerArbitraryCfg + overfit_to_scene + default_collate,
    generate_point_cloud_figure.py:83-97). Leaves gain a leading batch=1.
    """
    from ..dataset import get_dataset
    from ..dataset.view_sampler.view_sampler_arbitrary import ViewSamplerArbitraryCfg
    from ..utils.collation import collate

    sampler = ViewSamplerArbitraryCfg(
        "arbitrary",
        len(context_indices),
        len(target_indices),
        context_views=list(context_indices),
        target_views=list(target_indices),
    )
    dataset_cfg = dataclasses.replace(
        dataset_cfg, view_sampler=sampler, overfit_to_scene=scene
    )
    dataset = get_dataset(dataset_cfg, stage, None, seed=0)
    example = next(iter(dataset))
    return collate([example], merge_fn=np.stack)


def load_metrics_config(overrides: list[str], evaluation: str):
    """compute_metrics-style config with a config/evaluation overlay.

    The comparison figures are driven by the same (dataset, evaluation)
    pair the reference composes via `config_name=compute_metrics` +
    `+evaluation=<name>` (generate_image_comparison.py:148-162).
    Returns (root_cfg, evaluation_cfg).
    """
    from ..config import (
        CONFIG_ROOT,
        _convert,
        _deep_merge,
        _load_yaml,
        compose_config,
        load_typed_root_config,
    )
    from ..evaluation.evaluation_cfg import EvaluationCfg

    cfg_dict = compose_config(overrides, main_name="compute_metrics")
    data, _ = _load_yaml(CONFIG_ROOT / "evaluation" / f"{evaluation}.yaml")
    data.pop("defaults", None)
    cfg_dict = _deep_merge(cfg_dict, data)
    evaluation_cfg = _convert(cfg_dict.pop("evaluation", {}), EvaluationCfg)
    cfg_dict.pop("output_metrics_path", None)
    root = load_typed_root_config(
        {k: v for k, v in cfg_dict.items() if k != "index_generator"}
    )
    return root, evaluation_cfg


# ---------------------------------------------------------------------------
# Depth-sorted alpha compositing (render + overlay layers)
# ---------------------------------------------------------------------------


def composite_depth_layers(
    layers: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    canvas: np.ndarray,
) -> np.ndarray:
    """Alpha-composite (color, alpha, depth) layers, nearest-last wins.

    Every element is (3, h, w); alpha/depth are broadcast per channel like
    the reference's stack/argsort/cumprod chain
    (generate_point_cloud_figure.py:263-275).
    """
    colors = np.stack([np.asarray(c, np.float32) for c, _, _ in layers])
    alphas = np.stack([np.asarray(a, np.float32) for _, a, _ in layers])
    depths = np.stack([np.asarray(d, np.float32) for _, _, d in layers])
    order = np.argsort(depths, axis=0)
    colors = np.take_along_axis(colors, order, axis=0)
    alphas = np.take_along_axis(alphas, order, axis=0)
    t = np.cumprod(1.0 - alphas, axis=0)
    t = np.concatenate([np.ones_like(t[:1]), t[:-1]], axis=0)
    image = (t * colors).sum(axis=0)
    total_alpha = (t * alphas).sum(axis=0)
    return total_alpha * image + (1.0 - total_alpha) * np.asarray(canvas, np.float32)


def line_overlay_layers(
    lines: list[tuple[np.ndarray, np.ndarray]],
    view_extrinsics: np.ndarray,  # (4, 4) render camera
    view_intrinsics: np.ndarray,  # (3, 3) normalized
    image_shape: tuple[int, int],
    line_width: float,
    line_color=(0.0, 0.0, 0.0),
    point_density: float = 0.5,
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(color, alpha, depth) compositing layers for 3D line segments.

    One layer per segment, drawn back-to-front-safe: the alpha mask is an
    anti-aliased 2D line, the depth buffer is a chain of projected points
    along the segment (the reference's trick for occlusion against the
    Gaussian render, generate_point_cloud_figure.py:210-261).
    """
    import jax.numpy as jnp

    from ..geometry.projection import homogenize_points, project
    from ..visualization.drawing.lines import draw_lines
    from ..visualization.drawing.points import draw_points

    h, w = image_shape
    scale = np.asarray([w, h], np.float32)
    w2c = np.linalg.inv(view_extrinsics)
    zeros = jnp.zeros((3, h, w), jnp.float32)
    color_np = np.asarray(line_color, np.float32)

    layers = []
    for a, b in lines:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # Draw from the farther endpoint toward the nearer one.
        a_depth = (w2c @ np.append(a, 1.0))[2]
        b_depth = (w2c @ np.append(b, 1.0))[2]
        start, end = (a, b) if a_depth > b_depth else (b, a)

        start_2d = np.asarray(
            project(jnp.asarray(start), jnp.asarray(view_extrinsics), jnp.asarray(view_intrinsics))[0]
        )
        end_2d = np.asarray(
            project(jnp.asarray(end), jnp.asarray(view_extrinsics), jnp.asarray(view_intrinsics))[0]
        )

        alpha = np.asarray(
            draw_lines(
                zeros,
                (start_2d * scale)[None],
                (end_2d * scale)[None],
                (1.0, 1.0, 1.0),
                line_width,
            )
        )
        color = np.broadcast_to(color_np[:, None, None], (3, h, w)) * (alpha > 0)

        # Depth along the segment via dense projected points.
        delta = float(np.linalg.norm((start_2d - end_2d) * scale))
        num_points = max(int(delta / point_density), 1)
        t = np.linspace(0.0, 1.0, num_points + 1, dtype=np.float32)
        xyz = start[None] * t[:, None] + end[None] * (1.0 - t)[:, None]
        depth_vals = np.linalg.norm(xyz - view_extrinsics[:3, 3], axis=-1)
        xy = np.asarray(
            project(jnp.asarray(xyz), jnp.asarray(view_extrinsics), jnp.asarray(view_intrinsics))[0]
        )
        depth = np.asarray(
            draw_points(
                jnp.full((3, h, w), 1e10, jnp.float32),
                xy * scale,
                np.repeat(depth_vals[:, None], 3, axis=1),
                line_width,
            )
        )
        layers.append((color, alpha, depth))
    return layers


def frustum_lines(
    extrinsics: np.ndarray,  # (v, 4, 4)
    intrinsics: np.ndarray,  # (v, 3, 3)
    depth: np.ndarray,  # (v,)
    max_views: int | None = None,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """World-space camera-frustum wireframe segments (4 face edges + 4
    edges to the origin per view; generate_point_cloud_figure.py:195-208)."""
    import jax.numpy as jnp

    from ..visualization.drawing.cameras import unproject_frustum_corners

    corners = np.asarray(
        unproject_frustum_corners(
            jnp.asarray(extrinsics), jnp.asarray(intrinsics), jnp.asarray(depth)
        )
    )
    origins = extrinsics[:, :3, 3]
    lines = []
    for view, (view_corners, origin) in enumerate(zip(corners, origins)):
        if max_views is not None and view >= max_views:
            break
        for i in range(4):
            lines.append((view_corners[i], view_corners[i - 1]))
            lines.append((view_corners[i], origin))
    return lines


def to_uint8(image: np.ndarray) -> np.ndarray:
    """(3, h, w) float [0,1] -> (h, w, 3) uint8."""
    image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    return (image.transpose(1, 2, 0) * 255.0).round().astype(np.uint8)


def encode_image(image: np.ndarray, image_format: str = "png") -> str:
    """Encode a (3, h, w) float image as a data URI for SVG embedding."""
    from PIL import Image

    stream = BytesIO()
    Image.fromarray(to_uint8(image)).save(stream, image_format)
    data = base64.b64encode(stream.getvalue()).decode("ascii")
    return f"data:image/{image_format};base64,{data}"


class SvgFigure:
    """Minimal SVG document builder (images, lines, circles, text)."""

    def __init__(self, width: float, height: float):
        self.width = width
        self.height = height
        self._elements: list[str] = []

    def add_image(self, image: np.ndarray, x: float, y: float, w: float, h: float):
        uri = encode_image(image)
        self._elements.append(
            f'<image x="{x}" y="{y}" width="{w}" height="{h}" '
            f'xlink:href="{uri}"/>'
        )

    def add_line(self, x1, y1, x2, y2, color="#000", width=1.0):
        self._elements.append(
            f'<line x1="{x1}" y1="{y1}" x2="{x2}" y2="{y2}" '
            f'stroke="{color}" stroke-width="{width}"/>'
        )

    def add_circle(self, cx, cy, r, color="#000", fill="none"):
        self._elements.append(
            f'<circle cx="{cx}" cy="{cy}" r="{r}" stroke="{color}" fill="{fill}"/>'
        )

    def add_text(
        self, text, x=None, y=None, size=10, color="#000", anchor="start",
        transform=None,
    ):
        pos = ""
        if x is not None:
            pos = f'x="{x}" y="{y}" '
        tf = f'transform="{transform}" ' if transform else ""
        self._elements.append(
            f'<text {pos}{tf}font-size="{size}" fill="{color}" '
            f'text-anchor="{anchor}" font-family="sans-serif">{text}</text>'
        )

    def add_rect(
        self, width, height, x=None, y=None, fill="#fff", rx=0.0,
        transform=None,
    ):
        pos = ""
        if x is not None:
            pos = f'x="{x}" y="{y}" '
        tf = f'transform="{transform}" ' if transform else ""
        self._elements.append(
            f'<rect {pos}{tf}width="{width}" height="{height}" '
            f'rx="{rx}" ry="{rx}" fill="{fill}"/>'
        )

    def save(self, path: Path | str) -> None:
        body = "\n".join(self._elements)
        doc = (
            '<svg xmlns="http://www.w3.org/2000/svg" '
            'xmlns:xlink="http://www.w3.org/1999/xlink" '
            f'width="{self.width}" height="{self.height}" '
            f'viewBox="0 0 {self.width} {self.height}">\n{body}\n</svg>\n'
        )
        Path(path).write_text(doc)
