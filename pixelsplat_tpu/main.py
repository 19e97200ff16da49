"""CLI entry point: `python -m pixelsplat_tpu.main [+experiment=re10k] [k=v ...]`.

Counterpart of /root/reference/src/main.py (a Hydra app): composes the
config, builds the data module / model wrapper / trainer, and runs train or
test according to `mode`.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax

from .config import RootCfg, load_config
from .dataset.data_module import DataModule
from .loss import get_losses
from .model.decoder import get_decoder
from .training.checkpoint import latest_checkpoint
from .training.model_wrapper import ModelWrapper
from .training.trainer import Trainer
from .utils.step_tracker import StepTracker
from .utils.wandb_tools import select_logger


def cyan(text: str) -> str:
    return f"\033[36m{text}\033[0m"


def build_everything(cfg: RootCfg, global_rank: int = 0, world_size: int = 1):
    step_tracker = StepTracker()
    data_module = DataModule(
        cfg.dataset,
        cfg.data_loader,
        step_tracker=step_tracker,
        global_rank=global_rank,
        world_size=world_size,
    )
    decoder = get_decoder(cfg.model.decoder)
    losses = get_losses(list(cfg.loss))
    wrapper = ModelWrapper(
        cfg.optimizer,
        cfg.train,
        cfg.test,
        cfg.model.encoder,
        decoder,
        losses,
        gradient_clip_val=cfg.trainer.gradient_clip_val,
    )
    output_dir = Path(cfg.output_dir)
    trainer = Trainer(
        cfg.trainer,
        wrapper,
        data_module,
        cfg.checkpointing,
        output_dir,
        step_tracker=step_tracker,
        logger=select_logger(cfg.wandb, output_dir),
        seed=cfg.seed,
    )
    return trainer


def main(argv: list[str]) -> None:
    # Multi-host wiring first: after this, jax.devices() is the global
    # list and the data mesh spans hosts (reference: SLURM DDP launch,
    # src/main.py:94-106 with rank-dependent seeds at main.py:106).
    from .parallel.distributed import maybe_initialize

    rank, world = maybe_initialize()
    cfg = load_config(argv)
    print(cyan(f"mode={cfg.mode} rank={rank}/{world} devices={jax.devices()}"))
    trainer = build_everything(cfg, global_rank=rank, world_size=world)

    if cfg.mode == "train":
        resume = None
        if cfg.checkpointing.load is None:
            resume = latest_checkpoint(Path(cfg.output_dir) / "checkpoints")
        trainer.fit(resume_from=resume)
    elif cfg.mode == "test":
        assert cfg.checkpointing.load is not None, "mode=test needs checkpointing.load"
        from .training.checkpoint import load_checkpoint
        from .utils.wandb_tools import update_checkpoint_path

        ckpt = update_checkpoint_path(cfg.checkpointing.load, cfg.wandb)
        state = load_checkpoint(Path(ckpt))
        trainer.test(state)
    else:
        raise ValueError(f"Unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    main(sys.argv[1:])
