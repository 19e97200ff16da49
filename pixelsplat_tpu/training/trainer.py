"""Training/eval driver loops.

Counterpart of Lightning's Trainer usage in /root/reference/src/main.py:
fit() runs the jitted data-parallel train step over the train stream with
periodic validation, checkpointing and logging; test() runs the evaluation
protocol (probabilistic encoder — the reference's test protocol — per-scene
renders saved as PNGs, encoder/decoder timing via the Benchmarker, 32-view
decode chunking).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.data_module import DataModule
from ..evaluation.metrics import compute_psnr, compute_ssim
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.benchmarker import Benchmarker
from ..utils.local_logger import LocalLogger
from ..utils.step_tracker import StepTracker
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .model_wrapper import CheckpointingCfg, ModelWrapper, TrainState, _to_jax


@dataclass(frozen=True)
class TrainerCfg:
    max_steps: int = -1
    val_check_interval: int = 250
    gradient_clip_val: float = 0.5
    log_every_n_steps: int = 10
    # Split each device's batch into this many micro-batches, averaging
    # gradients before the single optimizer update (identical optimizer
    # semantics to the large batch). Lets the reference's one-A100
    # batch-7 recipe train on a 16 GB chip.
    accumulate_grad_batches: int = 1


def _strip_non_arrays(batch: dict) -> dict:
    """Remove fields jit can't trace (scene names)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = _strip_non_arrays(v)
        elif isinstance(v, np.ndarray) or hasattr(v, "dtype"):
            out[k] = v
        # else drop (e.g. list of scene strings)
    return out


class Trainer:
    def __init__(
        self,
        cfg: TrainerCfg,
        wrapper: ModelWrapper,
        data_module: DataModule,
        checkpointing: CheckpointingCfg,
        output_dir: Path,
        step_tracker: Optional[StepTracker] = None,
        logger: Optional[LocalLogger] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.wrapper = wrapper
        self.data_module = data_module
        self.checkpointing = checkpointing
        self.output_dir = Path(output_dir)
        self.step_tracker = step_tracker
        self.logger = logger or LocalLogger(self.output_dir / "local")
        self.seed = seed
        self.benchmarker = Benchmarker()

    # ------------------------------------------------------------------
    def fit(self, resume_from: Optional[Path] = None) -> TrainState:
        train_iter = iter(self.data_module.train_dataloader())
        first_batch = next(train_iter)
        state = self.wrapper.init_state(
            _strip_non_arrays(first_batch), seed=self.seed
        )
        if resume_from is None and self.checkpointing.load is not None:
            resume_from = Path(self.checkpointing.load)
        if resume_from is not None:
            state = load_checkpoint(resume_from, template=state)
            print(f"Resumed from {resume_from} at step {int(state.step)}")

        # Each process's loader yields its own per-rank batch (DDP
        # contract); the jitted step sees the GLOBAL batch over the
        # global mesh.
        nproc = jax.process_count()
        rank_zero = jax.process_index() == 0
        step_fn, mesh = self.wrapper.make_jit_train_step(
            batch_size=first_batch["context"]["image"].shape[0] * nproc,
            accumulate=self.cfg.accumulate_grad_batches,
        )
        key = jax.random.PRNGKey(self.seed + 7)

        max_steps = self.cfg.max_steps
        step = int(state.step)
        val_iter: Optional[Iterator] = None
        batch = first_batch
        while max_steps < 0 or step < max_steps:
            arrays = shard_batch(_strip_non_arrays(batch), mesh)
            key, sub = jax.random.split(key)
            state, parts = step_fn(state, arrays, sub)
            step += 1

            if self.step_tracker is not None:
                self.step_tracker.set_step(step)

            if rank_zero and step % self.cfg.log_every_n_steps == 0:
                host = {k: float(v) for k, v in parts.items()}
                self.logger.log_metrics(host, step=step)
                print(
                    f"step {step}; "
                    + "; ".join(f"{k}={v:.4f}" for k, v in host.items())
                )

            if (
                rank_zero
                and self.checkpointing.every_n_train_steps > 0
                and step % self.checkpointing.every_n_train_steps == 0
            ):
                path = save_checkpoint(
                    self.output_dir / "checkpoints", step, state
                )
                print(f"Saved checkpoint {path}")
                if hasattr(self.logger, "log_model"):
                    self.logger.log_model(path, step=step)

            # Validation renders/logs are rank-zero side effects
            # (Lightning's rank_zero_only gating); replicas keep training
            # state identical by construction (same psum'd update).
            if rank_zero and self.cfg.val_check_interval > 0 and step % self.cfg.val_check_interval == 0:
                if val_iter is None:
                    val_iter = iter(self.data_module.val_dataloader())
                try:
                    self.validation_step(state, next(val_iter), step)
                except StopIteration:
                    val_iter = None

            batch = next(train_iter)

        if rank_zero and not (
            self.checkpointing.every_n_train_steps > 0
            and step % self.checkpointing.every_n_train_steps == 0
        ):
            # Skip the final save when the periodic save already wrote this
            # exact step (orbax refuses to overwrite an existing step dir).
            save_checkpoint(self.output_dir / "checkpoints", step, state)
        return state

    # ------------------------------------------------------------------
    def validation_step(self, state: TrainState, batch: dict, step: int) -> dict:
        """Probabilistic vs deterministic render + metrics + comparison grid
        (reference model_wrapper.py:201-309); extended mode adds 3-axis
        Gaussian projections, camera diagrams and trajectory videos."""
        from ..visualization.annotation import add_label
        from ..visualization.layout import add_border, hcat, vcat

        arrays = _to_jax(_strip_non_arrays(batch))
        target = arrays["target"]["image"]
        b, v, c, h, w = target.shape
        encode = self.wrapper.make_eval_encode()

        variants = {}
        for name, deterministic in [("probabilistic", False), ("deterministic", True)]:
            gaussians = encode(
                state.params,
                arrays,
                deterministic,
                state.step,
                jax.random.PRNGKey(step),
            )
            out = self.wrapper.decoder(
                gaussians,
                arrays["target"]["extrinsics"],
                arrays["target"]["intrinsics"],
                arrays["target"]["near"],
                arrays["target"]["far"],
                (h, w),
            )
            variants[name] = (gaussians, out.color)

        metrics = {}
        flat_gt = target.reshape(b * v, c, h, w)
        # The reference logs the full PSNR/LPIPS/SSIM trio per variant
        # (model_wrapper.py:244-254). LPIPS uses whatever weights are on
        # disk; with no pretrained weights it is skipped rather than
        # logged from random VGG features.
        from ..evaluation.lpips import compute_lpips, get_lpips_params

        lpips_params, lpips_pretrained = get_lpips_params()
        for name, (_, color) in variants.items():
            flat = color.reshape(b * v, c, h, w)
            metrics[f"val/psnr_{name}"] = float(compute_psnr(flat_gt, flat).mean())
            metrics[f"val/ssim_{name}"] = float(compute_ssim(flat_gt, flat).mean())
            if lpips_pretrained:
                metrics[f"val/lpips_{name}"] = float(
                    compute_lpips(flat_gt, flat, lpips_params).mean()
                )
        self.logger.log_metrics(metrics, step=step)

        # Comparison grid: context views | GT | probabilistic | deterministic.
        context_row = hcat(
            *[np.asarray(arrays["context"]["image"][0, i]) for i in
              range(arrays["context"]["image"].shape[1])]
        )
        rows = [add_label(context_row, "Context")]
        rows.append(
            add_label(hcat(*[np.asarray(target[0, i]) for i in range(v)]), "Target (GT)")
        )
        for name, (_, color) in variants.items():
            rows.append(
                add_label(
                    hcat(*[np.asarray(color[0, i]) for i in range(v)]),
                    f"Target ({name})",
                )
            )
        self.logger.log_image("comparison", add_border(vcat(*rows)), step=step)

        if self.wrapper.train_cfg.extended_visualization:
            try:
                from ..visualization.validation_in_3d import (
                    render_cameras,
                    render_projections,
                )

                gaussians, _ = variants["deterministic"]
                projections = render_projections(gaussians, 256)
                self.logger.log_image(
                    "projections",
                    add_border(hcat(*[np.asarray(projections[0, i]) for i in range(3)])),
                    step=step,
                )
                cams = render_cameras(arrays, 256)
                self.logger.log_image(
                    "cameras", np.asarray(cams[0]), step=step
                )
                # Full encoder figure set (epipolar samples/colors,
                # overlaps, attention, Gaussian panels + histograms) -
                # reference encoder_visualizer_epipolar.py:36-128.
                from ..model.encoder.visualization.encoder_visualizer_epipolar import (  # noqa: E501
                    EncoderVisualizerEpipolar,
                    EncoderVisualizerEpipolarCfg,
                )

                visualizer = EncoderVisualizerEpipolar(
                    EncoderVisualizerEpipolarCfg(),
                    self.wrapper.encoder,
                    state.params,
                )
                for name, figure in visualizer.visualize(
                    arrays["context"], step
                ).items():
                    self.logger.log_image(f"encoder/{name}", figure, step=step)
                self.render_video_wobble(state, batch, step)
                self.render_video_interpolation(state, batch, step)
            except Exception as exc:  # visualization must never kill training
                print(f"extended visualization failed: {exc}")

        print("validation;", "; ".join(f"{k}={v:.3f}" for k, v in metrics.items()))
        return metrics

    # ------------------------------------------------------------------
    def render_video_wobble(self, state, batch: dict, step: int, num_frames: int = 60):
        """Camera-wobble video around the first context view (reference
        model_wrapper.py:311-335)."""
        import numpy as np

        from ..visualization.camera_trajectory.wobble import generate_wobble

        extr = np.asarray(batch["context"]["extrinsics"][0])
        intr = np.asarray(batch["context"]["intrinsics"][0])
        delta = float(np.linalg.norm(extr[0, :3, 3] - extr[-1, :3, 3]))
        t = np.linspace(0, 1, num_frames).astype(np.float32)
        cameras = generate_wobble(extr[0], np.asarray(delta * 0.25), t)
        intrinsics = np.broadcast_to(intr[0], (num_frames, 3, 3))
        return self._render_video(state, batch, cameras, intrinsics, "wobble", step)

    def render_video_interpolation(
        self, state, batch: dict, step: int, num_frames: int = 30
    ):
        """Context-to-context interpolation video (reference
        model_wrapper.py:337-361)."""
        import numpy as np

        from ..visualization.camera_trajectory.interpolation import (
            interpolate_extrinsics,
            interpolate_intrinsics,
        )

        extr = np.asarray(batch["context"]["extrinsics"][0])
        intr = np.asarray(batch["context"]["intrinsics"][0])
        t = np.linspace(0, 1, num_frames).astype(np.float32)
        cameras = interpolate_extrinsics(extr[0], extr[-1], t)
        intrinsics = interpolate_intrinsics(intr[0], intr[-1], t)
        return self._render_video(
            state, batch, cameras, intrinsics, "interpolation", step
        )

    def _render_video(self, state, batch, cameras, intrinsics, name, step):
        import numpy as np

        params = getattr(state, "params", state)
        arrays = _to_jax(_strip_non_arrays(batch))
        *_, h, w = np.asarray(arrays["context"]["image"]).shape
        near = float(np.asarray(arrays["context"]["near"][0, 0]))
        far = float(np.asarray(arrays["context"]["far"][0, 0]))
        encode = self.wrapper.make_eval_encode()
        gaussians = encode(
            params, arrays, True, jnp.asarray(step), jax.random.PRNGKey(0)
        )
        n = cameras.shape[0]
        out = self.wrapper.decoder(
            gaussians,
            jnp.asarray(cameras)[None],
            jnp.asarray(intrinsics)[None],
            jnp.full((1, n), near),
            jnp.full((1, n), far),
            (h, w),
        )
        frames = np.asarray(out.color[0])  # (n, 3, h, w)
        return self.logger.log_video(f"video/{name}", frames, step=step)

    # ------------------------------------------------------------------
    def test(
        self,
        state_or_params,
        chunk_size: int = 32,
    ) -> dict:
        """Evaluation protocol (reference model_wrapper.py:154-199):
        PROBABILISTIC encoder (deterministic=False -> gaussians_per_pixel=3,
        exactly as the reference's test_step encodes), render all target
        views (chunked), save PNGs per scene, dump benchmarks with the
        reference's encoder/decoder timing split."""
        params = getattr(state_or_params, "params", state_or_params)
        # SoA bridge: the test protocol only renders, so the encoder emits
        # the rasterizer's SoA layout directly (skips the AoS + SH-repeat
        # materialization between encode and render; see encoder_epipolar).
        encode_fn = self.wrapper.make_eval_encode(pack_soa=True)
        decode_fn = self.wrapper.make_eval_decode()
        eval_key = jax.random.PRNGKey(self.seed + 31)
        out_dir = Path(self.wrapper.test_cfg.output_path)
        name = "pixelsplat_tpu"

        from ..evaluation.lpips import compute_lpips, get_lpips_params

        lpips_params, lpips_pretrained = get_lpips_params()
        if not lpips_pretrained:
            # Like validation_step, never report LPIPS computed from random
            # VGG weights; the summary carries lpips=None so downstream
            # consumers see the metric was unavailable, not zero.
            print(
                "WARNING: LPIPS weights not found; skipping the LPIPS metric "
                "(summary will carry lpips=null)."
            )
        all_metrics: dict[str, list[float]] = {"psnr": [], "ssim": [], "lpips": []}
        count = 0
        overflow_total = 0
        for batch in self.data_module.test_dataloader():
            scene = batch["scene"][0]
            arrays = _to_jax(_strip_non_arrays(batch))
            b, v = arrays["target"]["image"].shape[:2]
            assert b == 1

            _, _, _, h, w = arrays["target"]["image"].shape
            eval_key, scene_key = jax.random.split(eval_key)
            with self.benchmarker.time("encoder"):
                gaussians = encode_fn(
                    params, arrays, False, jnp.asarray(0), scene_key
                )
                self.benchmarker.sync(jax.tree.leaves(gaussians)[0])

            colors = []
            with self.benchmarker.time("decoder", num_calls=v):
                tgt = arrays["target"]
                render_settings = None
                if self.wrapper.test_cfg.adaptive_capacity:
                    # Probe the scene's tile occupancy once (device sync,
                    # counted in the decoder timing) and render at the
                    # smallest sufficient capacity/pair-budget.
                    render_settings = self.wrapper.choose_eval_settings(
                        gaussians,
                        tgt["extrinsics"],
                        tgt["intrinsics"],
                        tgt["near"],
                        (h, w),
                    )
                for lo in range(0, v, chunk_size):
                    hi = min(lo + chunk_size, v)
                    color, chunk_overflow = decode_fn(
                        gaussians,
                        tgt["extrinsics"][:, lo:hi],
                        tgt["intrinsics"][:, lo:hi],
                        tgt["near"][:, lo:hi],
                        tgt["far"][:, lo:hi],
                        (h, w),
                        render_settings,
                    )
                    self.benchmarker.sync(color)
                    colors.append(np.asarray(color))
                    overflow_total += int(np.asarray(chunk_overflow))
            color = np.concatenate(colors, axis=1)[0]  # (v, 3, h, w)

            gt = np.asarray(arrays["target"]["image"][0])
            all_metrics["psnr"].append(
                float(compute_psnr(jnp.asarray(gt), jnp.asarray(color)).mean())
            )
            all_metrics["ssim"].append(
                float(compute_ssim(jnp.asarray(gt), jnp.asarray(color)).mean())
            )
            if lpips_pretrained:
                all_metrics["lpips"].append(
                    float(
                        compute_lpips(
                            jnp.asarray(gt), jnp.asarray(color), lpips_params
                        ).mean()
                    )
                )

            from PIL import Image

            color_dir = out_dir / name / scene / "color"
            color_dir.mkdir(parents=True, exist_ok=True)
            indices = np.asarray(batch["target"]["index"][0])
            for i, idx in enumerate(indices):
                img = (np.clip(color[i], 0, 1) * 255).astype(np.uint8)
                Image.fromarray(img.transpose(1, 2, 0)).save(
                    color_dir / f"{idx:0>6}.png"
                )
            count += 1

        self.benchmarker.dump(out_dir / name / "benchmark.json")
        self.benchmarker.dump_memory(out_dir / name / "peak_memory.json")
        summary = {k: float(np.mean(v)) for k, v in all_metrics.items() if v}
        if not lpips_pretrained:
            summary["lpips"] = None
        summary["num_scenes"] = count
        # The eval protocol requires zero dropped pairs: any overflow means
        # the reported metrics were computed on images with silently
        # missing Gaussians (raise RenderSettings.capacity and rerun).
        summary["overflow_pairs"] = overflow_total
        if overflow_total:
            print(
                f"WARNING: rasterizer dropped {overflow_total} (gaussian, "
                "tile) pairs at tile capacity during evaluation; metrics "
                "are not protocol-clean."
            )
        print("test;", summary)
        return summary
