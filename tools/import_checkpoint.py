"""Convert a published pixelSplat Lightning checkpoint to our orbax format.

Usage:
  PYTHONPATH=.:$PYTHONPATH python tools/import_checkpoint.py \
      re10k.ckpt outputs/imported/re10k [+experiment=re10k overrides...]

Loads the torch .ckpt, maps the encoder weights onto the Flax tree
(pixelsplat_tpu.interop.torch_import), wraps them in a fresh TrainState
(optimizer state initialized, step taken from the checkpoint), and saves an
orbax checkpoint the trainer/eval CLI can load via checkpointing.load.
"""

from __future__ import annotations

import sys
from pathlib import Path


def main(argv: list[str]) -> None:
    ckpt_path = Path(argv[0])
    out_dir = Path(argv[1])
    overrides = argv[2:]

    import jax.numpy as jnp

    from pixelsplat_tpu.config import load_config
    from pixelsplat_tpu.interop.torch_import import load_lightning_checkpoint
    from pixelsplat_tpu.loss import get_losses
    from pixelsplat_tpu.model.decoder.decoder_splatting import DecoderSplatting
    from pixelsplat_tpu.training.checkpoint import save_checkpoint
    from pixelsplat_tpu.training.model_wrapper import ModelWrapper, TrainState

    cfg = load_config(overrides)
    params = load_lightning_checkpoint(ckpt_path, cfg.model.encoder)

    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    step = int(raw.get("global_step", 0))

    wrapper = ModelWrapper(
        cfg.optimizer,
        cfg.train,
        cfg.test,
        cfg.model.encoder,
        DecoderSplatting(cfg.model.decoder),
        get_losses(list(cfg.loss)),
        gradient_clip_val=cfg.trainer.gradient_clip_val,
    )
    opt_state = wrapper.optimizer.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.asarray(step))
    path = save_checkpoint(out_dir, step, state)
    print(f"Imported {ckpt_path} (step {step}) -> {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
