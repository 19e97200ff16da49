"""Production-config training-step throughput on the real TPU.

Measures the full jitted train step (encoder fwd + decode fwd + losses +
backward + optimizer) at 256x256, 2 context + 4 target views, resnet50
encoder (the dino backbone differs only in cheap token MLPs; its hub
trunks are frozen-scale compute dominated by the same resnet50), at the
largest batch that fits one v5e chip. Reports ms/step and
examples/sec for comparison against the reference's "batch 7 on one
80 GB A100" recipe.

Usage: python tools/bench_train_step.py [batch ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices(), flush=True)

from pixelsplat_tpu.loss.loss_mse import LossMse, LossMseCfg
from pixelsplat_tpu.model.decoder.decoder_splatting import (
    DecoderSplatting,
    DecoderSplattingCfg,
)
from pixelsplat_tpu.model.encoder.backbone.resnet import BackboneResnetCfg
from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolarCfg
from pixelsplat_tpu.training.model_wrapper import (
    ModelWrapper,
    TestCfg,
    TrainCfg,
)
from pixelsplat_tpu.training.optimizer import OptimizerCfg


def make_batch(b, v, h, w, tv):
    rng = np.random.default_rng(0)

    def views(n):
        extr = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
        extr[..., 0, 3] = rng.uniform(-0.3, 0.3, (b, n))
        intr = np.tile(
            np.asarray(
                [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32
            ),
            (b, n, 1, 1),
        )
        return {
            "image": rng.uniform(0, 1, (b, n, 3, h, w)).astype(np.float32),
            "extrinsics": extr,
            "intrinsics": intr,
            "near": np.full((b, n), 1.0, np.float32),
            "far": np.full((b, n), 100.0, np.float32),
            "index": np.zeros((b, n), np.int64),
        }

    return {"context": views(v), "target": views(tv), "scene": ["s"] * b}


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 4, 7]
    h = w = 256
    enc_cfg = EncoderEpipolarCfg(
        d_feature=128,
        backbone=BackboneResnetCfg(model="resnet50", num_layers=5, d_out=512),
        gaussians_per_pixel=3,
    )
    wrapper = ModelWrapper(
        optimizer_cfg=OptimizerCfg(),
        train_cfg=TrainCfg(),
        test_cfg=TestCfg(output_path="/tmp/bench_test"),
        encoder_cfg=enc_cfg,
        decoder=DecoderSplatting(DecoderSplattingCfg()),
        losses=[LossMse(LossMseCfg())],
    )

    for b in batches:
        batch = make_batch(b, 2, h, w, 4)
        try:
            state = wrapper.init_state(batch)
            step_fn = jax.jit(wrapper.train_step, donate_argnums=(0,))
            rng = jax.random.PRNGKey(0)
            arrays = jax.device_put(
                {k: batch[k] for k in ("context", "target")}
            )
            t0 = time.time()
            state, parts = step_fn(state, arrays, rng)
            np.asarray(parts["loss/total"])
            compile_s = time.time() - t0
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                state, parts = step_fn(state, arrays, rng)
            np.asarray(parts["loss/total"])
            dt = (time.perf_counter() - t0) / n
            print(
                f"b={b}: {dt*1e3:.1f} ms/step, {b/dt:.2f} examples/s "
                f"(compile+first {compile_s:.0f}s, loss "
                f"{float(parts['loss/total']):.4f})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - report OOM per batch size
            print(f"b={b}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
