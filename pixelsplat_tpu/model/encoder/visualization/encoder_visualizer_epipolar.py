"""Encoder visualizations: epipolar samples, attention, depth, Gaussians.

Counterpart of /root/reference/src/model/encoder/visualization/
encoder_visualizer_epipolar.py:36-528 at full figure scope: epipolar
sample + color-sample views, context overlap masks, Gaussian panels
(opacity / color / covariance determinant), per-surface depth+disparity
maps, per-layer-per-head epipolar attention overlays, and Gaussian
scale/rotation histograms. The reference grabs attention by hooking
torch softmax modules; here the transformer `sow`s its attention maps
into Flax's `intermediates` collection.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.pairings import generate_heterogeneous_index
from ....visualization.annotation import add_label
from ....visualization.color_map import apply_color_map, apply_color_map_to_image
from ....visualization.colors import get_distinct_color
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
        if not self.encoder.cfg.use_epipolar_transformer:
            return {}
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
            sampling = dump["sampling"]
            out["epipolar_samples"] = self._visualize_epipolar_samples(
                context, sampling
            )
            out["epipolar_color_samples"] = (
                self._visualize_epipolar_color_samples(context)
            )
            out["overlaps"] = self._visualize_overlaps(context, sampling)
            attention = self._collect_attention(state)
            if attention is not None:
                out["attention"] = self._visualize_attention(
                    context, sampling, attention
                )
            pdf = self._collect_pdf(state)
            if pdf is not None:
                out["probabilities"] = self._visualize_probabilities(
                    context, sampling, pdf
                )
        if "depth" in dump:
            out["depth"] = self._visualize_depth(context, dump["depth"])
        out["gaussians"] = self._visualize_gaussians(context, gaussians)
        if "scales" in dump and "rotations" in dump:
            out["gaussian_stats"] = self._visualize_gaussian_stats(
                dump["scales"], dump["rotations"]
            )
        return out

    # ------------------------------------------------------------------
    def _pick_rays(self, num_rays: int) -> np.ndarray:
        rng = np.random.default_rng(0)
        return rng.choice(
            num_rays, size=min(self.cfg.num_samples, num_rays), replace=False
        )

    def _ray_view(self, image: np.ndarray, xy_ray: np.ndarray, w, h):
        colors = np.asarray(
            [get_distinct_color(i) for i in range(len(xy_ray))], np.float32
        )
        view = draw_points(jnp.asarray(image), xy_ray * [w, h], 0.0, 4.0)
        return draw_points(view, xy_ray * [w, h], colors, 3.0)

    def _visualize_epipolar_samples(self, context: dict, sampling) -> np.ndarray:
        """Reference figure: ray view + sample view with alternating
        bucket segments and per-ray colored sample points
        (encoder_visualizer_epipolar.py:375-463)."""
        images = np.asarray(context["image"][0])  # (v, 3, h, w)
        v, _, h, w = images.shape
        _, index_other = generate_heterogeneous_index(v)
        rv, rov = 0, 0
        picks = self._pick_rays(sampling.xy_sample.shape[3])
        s = sampling.xy_sample.shape[4]

        xy_ray = np.asarray(sampling.xy_ray[0, rv, picks])
        ray_view = self._ray_view(images[rv], xy_ray, w, h)

        near = np.asarray(sampling.xy_sample_near[0, rv, rov, picks])  # (r, s, 2)
        far = np.asarray(sampling.xy_sample_far[0, rv, rov, picks])
        other = images[index_other[rv, rov]]
        # Whole epipolar line in black, then alternating bucket segments.
        sample_view = draw_lines(
            jnp.asarray(other), near[:, 0] * [w, h], far[:, -1] * [w, h], 0.0, 5.0,
            cap="butt",
        )
        alt = np.tile(
            np.asarray([0.0, 1.0])[None, : , None], (len(picks), (s + 1) // 2, 3)
        )[:, :s].reshape(-1, 3)
        sample_view = draw_lines(
            sample_view,
            near.reshape(-1, 2) * [w, h],
            far.reshape(-1, 2) * [w, h],
            alt,
            3.0,
            cap="butt",
        )
        pts = np.asarray(sampling.xy_sample[0, rv, rov, picks]).reshape(-1, 2)
        pt_colors = np.asarray(
            [get_distinct_color(i // s) for i in range(s * len(picks))],
            np.float32,
        )
        sample_view = draw_points(sample_view, pts * [w, h], 0.0, 4.0)
        sample_view = draw_points(sample_view, pts * [w, h], pt_colors, 3.0)

        return add_border(
            hcat(
                add_label(np.asarray(ray_view), "Ray View"),
                add_label(np.asarray(sample_view), "Sample View"),
            )
        )

    def _visualize_epipolar_color_samples(self, context: dict) -> np.ndarray:
        """Reference figure: raw image colors sampled along epipolar lines
        (encoder_visualizer_epipolar.py:466-528)."""
        from ..epipolar.epipolar_sampler import sample_along_epipolar_lines

        images = context["image"]  # (b, v, 3, h, w)
        b, v, _, h, w = images.shape
        sampling = sample_along_epipolar_lines(
            jnp.transpose(images, (0, 1, 3, 4, 2)),
            context["extrinsics"],
            context["intrinsics"],
            context["near"],
            context["far"],
            self.encoder.cfg.epipolar_transformer.num_samples,
        )
        _, index_other = generate_heterogeneous_index(v)
        rv, rov = 0, 0
        picks = self._pick_rays(sampling.xy_sample.shape[3])
        s = sampling.xy_sample.shape[4]
        imgs = np.asarray(images[0])

        xy_ray = np.asarray(sampling.xy_ray[0, rv, picks])
        ray_view = self._ray_view(imgs[rv], xy_ray, w, h)

        pts = np.asarray(sampling.xy_sample[0, rv, rov, picks]).reshape(-1, 2)
        ring = np.asarray(
            [get_distinct_color(i // s) for i in range(s * len(picks))],
            np.float32,
        )
        fill = np.asarray(
            sampling.features[0, rv, rov, picks], np.float32
        ).reshape(-1, 3)
        sample_view = draw_points(
            jnp.asarray(imgs[index_other[rv, rov]]), pts * [w, h], ring, 4.0
        )
        sample_view = draw_points(sample_view, pts * [w, h], fill, 3.0)

        return add_border(
            hcat(
                add_label(np.asarray(ray_view), "Ray View"),
                add_label(np.asarray(sample_view), "Sample View"),
            )
        )

    def _visualize_overlaps(self, context: dict, sampling) -> np.ndarray:
        """Reference figure: green-tinted valid-epipolar-overlap masks per
        (view, other view) (encoder_visualizer_epipolar.py:231-268)."""
        images = np.asarray(context["image"][0])  # (v, 3, h, w)
        v, _, h, w = images.shape
        ds = self.encoder.cfg.epipolar_transformer.downscale or 1
        hd, wd = h // ds, w // ds
        green = np.asarray([0.235, 0.706, 0.294], np.float32)[:, None, None]
        _, index_other = generate_heterogeneous_index(v)

        rows = []
        for view in range(v):
            valid = np.asarray(
                sampling.valid[0, view], np.float32
            ).reshape(-1, hd, wd)  # (ov, hd, wd)
            tiles = []
            for ov in range(valid.shape[0]):
                mask = np.repeat(np.repeat(valid[ov], ds, 0), ds, 1)[None]
                overlay = mask * (green + images[index_other[view, ov]]) / 2
                tiles.append(overlay)
            rows.append(hcat(images[view], *tiles))
        return add_border(add_label(vcat(*rows), "Context Overlaps"))

    def _visualize_gaussians(self, context: dict, gaussians) -> np.ndarray:
        """Reference figure: opacity / color / raw color / covariance
        determinant panels (encoder_visualizer_epipolar.py:270-300)."""
        images = np.asarray(context["image"][0])  # (v, 3, h, w)
        v, _, h, w = images.shape
        gpp = self.encoder.cfg.gaussians_per_pixel
        srf = self.encoder.cfg.num_surfaces

        def to_maps(x, ch):
            # (v * h * w * srf * gpp, ...) -> (gpp, v, ch, h, w); srf 0.
            arr = np.asarray(x, np.float32).reshape(v, h, w, srf, gpp, ch)
            return arr[:, :, :, 0].transpose(3, 0, 4, 1, 2)

        opacity = to_maps(gaussians.opacities[0, :, None], 1)
        opacity = np.repeat(opacity, 3, axis=2)
        colors = np.clip(to_maps(gaussians.harmonics[0, :, :, 0], 3) + 0.5, 0, 1)
        det = np.linalg.det(np.asarray(gaussians.covariances[0], np.float64))
        det = apply_color_map(
            (det / max(det.max(), 1e-30)).astype(np.float32), "inferno"
        )
        det = to_maps(det, 3)

        def grid(maps):
            return vcat(*[hcat(*row) for row in maps])

        return add_border(
            hcat(
                add_label(hcat(*images), "Context"),
                add_label(grid(opacity), "Opacities"),
                add_label(grid(colors * opacity), "Colors"),
                add_label(grid(colors), "Colors (Raw)"),
                add_label(grid(det), "Determinant"),
            )
        )

    def _visualize_depth(self, context: dict, depth) -> np.ndarray:
        """Reference figure: per-surface relative depth + disparity
        (encoder_visualizer_epipolar.py:204-229)."""
        d_all = np.asarray(depth[0])  # (v, h, w, srf, spp)
        near = np.asarray(context["near"][0], np.float32)[:, None, None]
        far = np.asarray(context["far"][0], np.float32)[:, None, None]
        panels = []
        for i in range(d_all.shape[3]):
            d = d_all[:, :, :, i].mean(axis=-1)  # (v, h, w)
            rel_depth = np.clip((d - near) / (far - near), 0, 1)
            rel_disp = np.clip(
                1 - (1 / d - 1 / far) / (1 / near - 1 / far), 0, 1
            )
            rel_depth = apply_color_map_to_image(rel_depth, "turbo")
            rel_disp = apply_color_map_to_image(rel_disp, "turbo")
            panels.append(
                add_border(
                    hcat(
                        add_label(hcat(*rel_depth), "Depth"),
                        add_label(hcat(*rel_disp), "Disparity"),
                    )
                )
            )
        return add_border(vcat(*panels))

    def _visualize_attention(
        self, context: dict, sampling, attention: np.ndarray
    ) -> np.ndarray:
        """Reference figure: per-layer, per-head attention-weighted
        epipolar segments (encoder_visualizer_epipolar.py:130-202)."""
        images = np.asarray(context["image"][0])
        v, _, h, w = images.shape
        _, index_other = generate_heterogeneous_index(v)
        rv, rov = 0, 0
        r = sampling.xy_sample.shape[3]
        s = sampling.xy_sample.shape[4]
        picks = self._pick_rays(r)

        # attention: (layer, b*v*r, head, 1, s*ov) -> per ray/hd/sample.
        layers = []
        base_colors = np.asarray(
            [get_distinct_color(i) for i in range(len(picks))], np.float32
        )
        near = np.asarray(sampling.xy_sample_near[0, rv, rov, picks]).reshape(-1, 2)
        far = np.asarray(sampling.xy_sample_far[0, rv, rov, picks]).reshape(-1, 2)
        other = jnp.asarray(images[index_other[rv, rov]])
        num_layers = attention.shape[0]
        num_heads = attention.shape[2]
        ov_total = sampling.xy_sample.shape[2]
        for il in range(num_layers):
            attn = attention[il].reshape(1, v, r, num_heads, s * ov_total)
            attn = attn.reshape(1, v, r, num_heads, s, ov_total)[
                0, rv, picks, :, :, rov
            ]  # (picks, hd, s)
            heads = []
            for ihd in range(num_heads):
                weight = attn[:, ihd, :, None]  # (picks, s, 1)
                col = (weight * base_colors[:, None]).reshape(-1, 3)
                heads.append(
                    np.asarray(
                        draw_lines(other, near * [w, h], far * [w, h], col, 3.0,
                                   cap="butt")
                    )
                )
            layers.append(add_label(vcat(*heads), f"Layer {il}"))
        ray_view = self._ray_view(
            images[rv], np.asarray(sampling.xy_ray[0, rv, picks]), w, h
        )
        vis = add_label(add_border(hcat(*layers)), "Keys & Values")
        return add_border(hcat(add_label(np.asarray(ray_view), "Rays"), vis))

    def _visualize_probabilities(
        self, context: dict, sampling, pdf: np.ndarray
    ) -> np.ndarray:
        """Reference figure: depth-bucket pdf drawn as per-ray colored
        epipolar segments, raw and per-ray-magnified
        (encoder_visualizer_epipolar.py:302-373 — defined there but left
        unwired; wired into visualize() here)."""
        images = np.asarray(context["image"][0])  # (v, 3, h, w)
        v, _, h, w = images.shape
        _, index_other = generate_heterogeneous_index(v)
        rv, rov = 0, 0
        picks = self._pick_rays(sampling.xy_sample.shape[3])
        colors = np.asarray(
            [get_distinct_color(i) for i in range(len(picks))], np.float32
        )

        xy_ray = np.asarray(sampling.xy_ray[0, rv, picks])  # (k, 2)
        ray_view = self._ray_view(images[rv], xy_ray, w, h)

        # pdf: (b, v, full-res rays, srf, buckets); the epipolar sampling
        # grid is downscaled, so read each coarse ray's pdf at its nearest
        # full-resolution pixel (surface 0, as in the reference).
        p_full = np.asarray(pdf[0, rv, :, 0, :], np.float32).reshape(h, w, -1)
        ix = np.clip((xy_ray[:, 0] * w).astype(int), 0, w - 1)
        iy = np.clip((xy_ray[:, 1] * h).astype(int), 0, h - 1)
        p = p_full[iy, ix]  # (k, buckets)

        # Depth buckets and epipolar samples are both evenly spaced in
        # relative disparity; resample if the counts differ.
        s = sampling.xy_sample.shape[4]
        if p.shape[-1] != s:
            grid_b = (np.arange(p.shape[-1]) + 0.5) / p.shape[-1]
            grid_s = (np.arange(s) + 0.5) / s
            p = np.stack([np.interp(grid_s, grid_b, row) for row in p])

        near = np.asarray(sampling.xy_sample_near[0, rv, rov, picks]).reshape(-1, 2)
        far = np.asarray(sampling.xy_sample_far[0, rv, rov, picks]).reshape(-1, 2)
        other = jnp.asarray(images[index_other[rv, rov]])

        col = (p[:, :, None] * colors[:, None, :]).reshape(-1, 3)
        sample_view = draw_lines(
            other, near * [w, h], far * [w, h], col, 6.0, cap="butt"
        )
        p_mag = p / np.maximum(p.max(axis=-1, keepdims=True), 1e-9)
        col_mag = (p_mag[:, :, None] * colors[:, None, :]).reshape(-1, 3)
        sample_view_mag = draw_lines(
            other, near * [w, h], far * [w, h], col_mag, 6.0, cap="butt"
        )

        return add_border(
            hcat(
                add_label(np.asarray(ray_view), "Rays"),
                add_label(np.asarray(sample_view), "Samples"),
                add_label(
                    np.asarray(sample_view_mag), "Samples (Magnified PDF)"
                ),
            )
        )

    def _collect_pdf(self, state) -> Optional[np.ndarray]:
        """Depth-bucket pdf sown by DepthPredictorMonocular."""
        inter = state.get("intermediates", {})
        dp = inter.get("depth_predictor", {})
        pdf = dp.get("pdf")
        if pdf is None:
            return None
        return np.asarray(pdf[0])

    def _visualize_gaussian_stats(self, scales, rotations) -> np.ndarray:
        """Gaussian scale / rotation-angle histograms (matplotlib Agg)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        scales = np.asarray(scales[0], np.float32).reshape(-1, 3)
        rotations = np.asarray(rotations[0], np.float32).reshape(-1, 4)
        # Rotation angle from the quaternion's scalar component.
        wq = np.clip(np.abs(rotations[:, -1]) /
                     (np.linalg.norm(rotations, axis=-1) + 1e-9), 0, 1)
        angles = 2.0 * np.degrees(np.arccos(wq))

        fig, axes = plt.subplots(1, 2, figsize=(8, 3), dpi=100)
        axes[0].hist(np.log10(np.maximum(scales.reshape(-1), 1e-9)), bins=64)
        axes[0].set_title("log10 Gaussian scales")
        axes[1].hist(angles, bins=64)
        axes[1].set_title("rotation angle (deg)")
        fig.tight_layout()
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)
        return img.transpose(2, 0, 1).astype(np.float32) / 255.0

    def _collect_attention(self, state) -> Optional[np.ndarray]:
        """Stack the epipolar transformer's sown attention maps as
        (layer, tokens, head, q, k)."""
        inter = state.get("intermediates", {})
        et = inter.get("epipolar_transformer", {})
        maps = []
        for path, value in sorted(
            _iter_sown(et), key=lambda kv: "/".join(kv[0])
        ):
            if path[-1] == "attention" and "self_attention" not in path:
                maps.append(np.asarray(value[0]))
        if not maps:
            return None
        return np.stack(maps)


def _iter_sown(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_sown(v, path + (k,))
    else:
        yield path, tree
