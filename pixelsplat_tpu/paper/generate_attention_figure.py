"""Epipolar attention figure: query points + attention-colored sample lines.

Counterpart of /root/reference/src/paper/generate_attention_figure.py
(:1-240): loads a trained checkpoint, encodes the figure scene while
capturing the epipolar transformer's softmax attention (the reference
hooks the attend module; here the transformer `sow`s it into the
`intermediates` collection), then emits an SVG with the two context views
side by side — colored query points in the left view, and for each query
the epipolar segment in the right view drawn per-sample with the chosen
layer/head's attention weight modulating the query color.

Usage:
  python -m pixelsplat_tpu.paper.generate_attention_figure \
      +experiment=re10k checkpointing.load=<ckpt> \
      [--output attention.svg] [--scene name:c0:c1] \
      [--layer 1] [--head 2] [--query x,y ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..visualization.colors import get_distinct_color
from .common import MARGIN, SvgFigure, load_model, load_scene

# The published figure scene + query pixels (reference :29-44).
SCENE = ("2177ca3a775a9ee9", 135, 195)
QUERIES = (
    (238, 168),  # sofa pillow corner
    (238, 80),  # painting corner
    (159, 195),  # plant leaves
    (227, 277),  # carpet corner
    (300, 80),  # random spot on wall
)
QUERIES = tuple((x / 400.0, y / 400.0) for x, y in QUERIES)
LAYER = 1
HEAD = 2
FIGURE_WIDTH = 240
LINE_WIDTH = 4.0
RAY_RADIUS = 2.0
RAY_BACKER_RADIUS = 2.5


def _to_hex(color: np.ndarray) -> str:
    r, g, b = (int(np.clip(c, 0.0, 1.0) * 255) for c in np.asarray(color))
    return f"#{r:02x}{g:02x}{b:02x}"


def _collect_cross_attention(state) -> np.ndarray:
    """Sown cross-attention maps stacked as (layer, tokens, head, 1, s)."""
    inter = state.get("intermediates", {})
    et = inter.get("epipolar_transformer", {})
    maps = []

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif path and path[-1] == "attention" and "self_attention" not in "/".join(
            str(p) for p in path
        ):
            maps.append((path, np.asarray(tree[0])))

    walk(et)
    maps.sort(key=lambda kv: "/".join(str(p) for p in kv[0]))
    return np.stack([m for _, m in maps])


def main(argv: list[str]) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=Path, default=Path("attention.svg"))
    parser.add_argument("--scene", default=None, metavar="name:c0:c1")
    parser.add_argument("--layer", type=int, default=LAYER)
    parser.add_argument("--head", type=int, default=HEAD)
    parser.add_argument(
        "--query",
        action="append",
        default=None,
        metavar="x,y",
        help="normalized query positions (repeatable; default: published set)",
    )
    args, overrides = parser.parse_known_args(argv)

    cfg = load_config(["+experiment=re10k", "mode=test", *overrides])
    encoder, _, variables = load_model(cfg)
    if args.scene:
        scene, c0, c1 = args.scene.split(":")
        scene_spec = (scene, int(c0), int(c1))
    else:
        scene_spec = SCENE
    queries = (
        [tuple(float(t) for t in q.split(",")) for q in args.query]
        if args.query
        else list(QUERIES)
    )

    scene, c0, c1 = scene_spec
    example = load_scene(cfg.dataset, scene, [c0, c1], [c0, c1])
    context = {k: jnp.asarray(v) for k, v in example["context"].items()}
    visualization_dump: dict = {}
    _, state = encoder.apply(
        variables,
        context,
        jnp.asarray(0),
        True,
        visualization_dump=visualization_dump,
        mutable=["intermediates"],
    )
    attention = _collect_cross_attention(state)
    sampling = visualization_dump["sampling"]

    context_images = np.asarray(example["context"]["image"])
    b, v, _, h, w = context_images.shape
    ds = cfg.model.encoder.epipolar_transformer.downscale
    hd, wd = h // ds, w // ds

    # Map normalized queries to token indices at the transformer's
    # (downscaled) resolution (reference :120-125).
    wh = np.asarray([wd, hd], np.float32)
    cols_rows = (np.asarray(queries, np.float32) * wh).astype(np.int64)
    token_rows = cols_rows[:, 1] * wd + cols_rows[:, 0]

    rb, rv, rov = 0, 0, 0
    _, _, _, r, s, _ = np.asarray(sampling.xy_sample).shape
    num_layers = attention.shape[0]
    # (l, b*v*r, hd, 1, s*ov) -> (l, r, hd, s) for the chosen batch/view.
    attention = attention.reshape(num_layers, b, v, r, attention.shape[2], -1)
    attention = attention[:, rb, rv, token_rows]  # (l, queries, hd, s*ov)
    attn = attention[args.layer, :, args.head, :]  # (queries, s*ov)
    attn = attn[:, rov * s : (rov + 1) * s]
    attn = attn / np.maximum(attn.max(axis=-1, keepdims=True), 1e-12)

    colors = np.asarray([get_distinct_color(i) for i in range(len(token_rows))])

    left_image = context_images[rb, rv]
    # With v=2 the only other view is 1 - rv (reference uses
    # encoder.sampler.index_v).
    right_image = context_images[rb, (rv + 1 + rov) % v]

    # --- SVG assembly (reference :147-236) ---
    image_width = (FIGURE_WIDTH - MARGIN) / 2
    image_height = image_width * h / w
    fig = SvgFigure(FIGURE_WIDTH, image_height)
    fig.add_image(left_image, 0, 0, image_width, image_height)
    fig.add_image(right_image, image_width + MARGIN, 0, image_width, image_height)

    scale = np.asarray([image_width, image_height], np.float32)
    xy_ray = np.asarray(sampling.xy_ray)
    xy_near = np.asarray(sampling.xy_sample_near)
    xy_far = np.asarray(sampling.xy_sample_far)

    for q_idx, token in enumerate(token_rows):
        # The full epipolar segment: black backer line (clipped by the
        # viewBox) behind the per-sample attention-colored segments.
        start = xy_near[rb, rv, rov, token, 0] * scale
        end = xy_far[rb, rv, rov, token, -1] * scale
        start = start + [image_width + MARGIN, 0]
        end = end + [image_width + MARGIN, 0]
        fig.add_line(
            2 * start[0] - end[0],
            2 * start[1] - end[1],
            end[0],
            end[1],
            color="#000000",
            width=LINE_WIDTH,
        )
        for sv in range(s):
            seg_a = xy_near[rb, rv, rov, token, sv] * scale
            seg_b = xy_far[rb, rv, rov, token, sv] * scale
            fig.add_line(
                seg_a[0] + image_width + MARGIN,
                seg_a[1],
                seg_b[0] + image_width + MARGIN,
                seg_b[1],
                color=_to_hex(colors[q_idx] * attn[q_idx, sv]),
                width=LINE_WIDTH,
            )

    # Query points last so they sit on top (backer ring + colored dot).
    for q_idx, token in enumerate(token_rows):
        ray_xy = xy_ray[rb, rv, token] * scale
        fig.add_circle(
            ray_xy[0], ray_xy[1], RAY_BACKER_RADIUS, color="none", fill="#000000"
        )
        fig.add_circle(
            ray_xy[0],
            ray_xy[1],
            RAY_RADIUS,
            color="none",
            fill=_to_hex(colors[q_idx]),
        )

    args.output.parent.mkdir(parents=True, exist_ok=True)
    fig.save(args.output)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main(sys.argv[1:])
