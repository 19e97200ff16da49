"""Encoder visualizations: epipolar samples, attention, depth, Gaussians.

Counterpart of /root/reference/src/model/encoder/visualization/
encoder_visualizer_epipolar.py (which hooks torch softmax modules). Here
attention maps are captured through Flax's `intermediates` collection
(`Attention.sow`), and the visualizations are assembled with the
layout/drawing utilities.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....visualization.annotation import add_label
from ....visualization.color_map import apply_color_map_to_image
from ....visualization.drawing.lines import draw_lines
from ....visualization.drawing.points import draw_points
from ....visualization.layout import add_border, hcat, vcat


@dataclass(frozen=True)
class EncoderVisualizerEpipolarCfg:
    num_samples: int = 8
    min_resolution: int = 256
    export_ply: bool = False


class EncoderVisualizerEpipolar:
    def __init__(self, cfg: EncoderVisualizerEpipolarCfg, encoder, params):
        self.cfg = cfg
        self.encoder = encoder
        self.params = params

    # ------------------------------------------------------------------
    def visualize(
        self,
        context: dict,
        global_step: int,
        rng: Optional[jax.Array] = None,
    ) -> dict[str, np.ndarray]:
        """Run the encoder with visualization dumps and intermediates."""
        dump: dict[str, Any] = {}
        rngs = {"sample": rng if rng is not None else jax.random.PRNGKey(0)}
        gaussians, state = self.encoder.apply(
            self.params,
            context,
            jnp.asarray(global_step),
            False,
            visualization_dump=dump,
            rngs=rngs,
            mutable=["intermediates"],
        )

        out: dict[str, np.ndarray] = {}
        if "sampling" in dump:
            out["epipolar_samples"] = self._visualize_epipolar_samples(
                context, dump["sampling"]
            )
        if "depth" in dump:
            out["depth"] = self._visualize_depth(context, dump["depth"])
        attention = self._collect_attention(state)
        if attention is not None:
            out["attention"] = attention
        return out

    # ------------------------------------------------------------------
    def _visualize_epipolar_samples(self, context: dict, sampling) -> np.ndarray:
        """Draw sampled epipolar points of a few rays over the other view."""
        images = np.asarray(context["image"][0])  # (v, 3, h, w)
        v, _, h, w = images.shape
        rng = np.random.default_rng(0)
        num_rays = sampling.xy_sample.shape[3]
        picks = rng.choice(num_rays, size=min(self.cfg.num_samples, num_rays), replace=False)

        rows = []
        for view in range(v):
            # Rays cast from `view` land on other views; visualize ov=0.
            xy_samples = np.asarray(sampling.xy_sample[0, view, 0, picks])  # (s?, smp, 2)
            xy_ray = np.asarray(sampling.xy_ray[0, view, picks])  # (n, 2)
            source = images[view]
            other = images[(view + 1) % v]
            left = draw_points(
                jnp.asarray(source),
                xy_ray * [w, h],
                (1.0, 0.0, 0.0),
                3.0,
            )
            flat = xy_samples.reshape(-1, 2) * [w, h]
            right = draw_points(
                jnp.asarray(other), flat, (0.0, 1.0, 0.0), 1.5
            )
            rows.append(
                hcat(
                    add_label(np.asarray(left), f"view {view} rays"),
                    add_label(np.asarray(right), "epipolar samples"),
                )
            )
        return add_border(vcat(*rows))

    def _visualize_depth(self, context: dict, depth) -> np.ndarray:
        """Depth maps per view (first surface/sample), colormapped disparity."""
        d = np.asarray(depth[0, :, :, :, 0, 0])  # (v, h, w)
        near = float(np.asarray(context["near"][0, 0]))
        far = float(np.asarray(context["far"][0, 0]))
        disp = 1.0 / np.maximum(d, 1e-6)
        lo, hi = 1.0 / far, 1.0 / max(near, 1e-6)
        norm = np.clip((disp - lo) / max(hi - lo, 1e-9), 0, 1)
        mapped = apply_color_map_to_image(norm, "turbo")  # (v, 3, h, w)
        return add_border(hcat(*[mapped[i] for i in range(mapped.shape[0])]))

    def _collect_attention(self, state) -> Optional[np.ndarray]:
        """Summarize captured attention maps as per-layer mean images."""
        inter = state.get("intermediates", {})
        maps = []
        for path, value in _iter_sown(inter):
            if path[-1] == "attention":
                attn = np.asarray(value[0])
                # (tokens?, heads, q, k): average everything but k.
                mean = attn.mean(axis=tuple(range(attn.ndim - 1)))
                maps.append(mean)
        if not maps:
            return None
        width = max(m.shape[0] for m in maps)
        rows = [np.pad(m, (0, width - m.shape[0]))[None].repeat(8, 0) for m in maps]
        img = np.concatenate(rows, axis=0)
        img = img / max(img.max(), 1e-9)
        return apply_color_map_to_image(img, "viridis")


def _iter_sown(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_sown(v, path + (k,))
    else:
        yield path, tree
