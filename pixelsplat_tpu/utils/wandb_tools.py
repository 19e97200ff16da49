"""wandb integration helpers, gated on wandb availability.

Counterpart of /root/reference/src/misc/wandb_tools.py: resolve
`wandb://run_id[:version]` checkpoint URIs to local artifact paths, and
provide a logger that prefers wandb when importable, else LocalLogger.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

from .local_logger import LocalLogger

try:  # wandb is not part of the baked environment; gate it.
    import wandb  # type: ignore

    WANDB_AVAILABLE = True
except Exception:  # pragma: no cover
    wandb = None
    WANDB_AVAILABLE = False


def version_to_int(artifact) -> int:
    """Convert a wandb version string like 'v12' to 12."""
    return int(artifact.version[1:])


def download_checkpoint(run_id: str, download_dir: Path, version: Optional[str]) -> Path:
    if not WANDB_AVAILABLE:
        raise RuntimeError("wandb:// checkpoint URIs require the wandb package")
    api = wandb.Api()
    run = api.run(run_id)
    chosen = None
    for artifact in run.logged_artifacts():
        if artifact.type != "model":
            continue
        if version is None:
            if chosen is None or version_to_int(artifact) > version_to_int(chosen):
                chosen = artifact
        elif artifact.version == version:
            chosen = artifact
    if chosen is None:
        raise ValueError(f"No matching checkpoint artifact for {run_id}:{version}")
    download_dir.mkdir(exist_ok=True, parents=True)
    root = chosen.download(root=str(download_dir))
    return Path(root) / "model.ckpt"


def update_checkpoint_path(path: Optional[Union[str, Path]], wandb_cfg) -> Optional[Path]:
    """Resolve wandb:// URIs; pass plain paths through."""
    if path is None:
        return None
    path = str(path)
    if not path.startswith("wandb://"):
        return Path(path)
    run_id, *rest = path[len("wandb://") :].split(":")
    version = rest[0] if rest else None
    project = getattr(wandb_cfg, "project", "pixelsplat_tpu")
    entity = getattr(wandb_cfg, "entity", "")
    full_run = f"{entity}/{project}/{run_id}" if entity else f"{project}/{run_id}"
    return download_checkpoint(full_run, Path("checkpoints"), version)


class WandbLogger:
    """Logger that mirrors LocalLogger's interface through wandb.

    Counterpart of the reference's WandbLogger setup
    (/root/reference/src/main.py:56-70: scalars, images, videos and
    `log_model="all"` checkpoint artifacts). Everything is also written
    through the wrapped LocalLogger, so a dropped connection or a killed
    run never loses the local copies.
    """

    def __init__(self, cfg, output_dir: Path, config_dict: Optional[dict] = None):
        self.local = LocalLogger(Path(output_dir) / "local")
        self.run = None
        if WANDB_AVAILABLE and getattr(cfg, "mode", "disabled") != "disabled":
            self.run = wandb.init(
                project=cfg.project,
                entity=cfg.entity or None,
                name=cfg.name,
                mode=cfg.mode,
                tags=list(getattr(cfg, "tags", ()) or ()),
                dir=str(output_dir),
                config=config_dict,
            )

    @property
    def path(self) -> Path:
        return self.local.path

    def log_metrics(self, metrics: dict, step=None) -> None:
        self.local.log_metrics(metrics, step=step)
        if self.run is not None:
            wandb.log(metrics, step=step)

    def log_image(self, key: str, image, step=None) -> None:
        self.local.log_image(key, image, step=step)
        if self.run is not None:
            wandb.log(
                {key: wandb.Image(str(self.local.path / key / f"{step or 0:0>6}.png"))},
                step=step,
            )

    def log_video(self, key: str, frames, step=None, fps: int = 30) -> Path:
        path = self.local.log_video(key, frames, step=step, fps=fps)
        if self.run is not None:
            # wandb.Video reads the encoded file; GIF fallback uploads too.
            wandb.log({key: wandb.Video(str(path), fps=fps)}, step=step)
        return path

    def log_model(self, checkpoint_path, step=None) -> None:
        """Upload an orbax checkpoint directory as a model artifact
        (reference: Lightning's log_model='all')."""
        if self.run is None:
            return
        artifact = wandb.Artifact(f"model-{self.run.id}", type="model")
        artifact.add_dir(str(checkpoint_path))
        self.run.log_artifact(artifact, aliases=[f"step-{step}"] if step else None)

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()


def select_logger(wandb_cfg, output_dir: Path, config_dict: Optional[dict] = None):
    """The reference enables wandb whenever cfg.wandb.mode != 'disabled'
    (/root/reference/src/main.py:55). Here wandb is optional: use it when
    requested AND importable, else fall back to the LocalLogger."""
    if WANDB_AVAILABLE and getattr(wandb_cfg, "mode", "disabled") != "disabled":
        return WandbLogger(wandb_cfg, Path(output_dir), config_dict)
    return LocalLogger(Path(output_dir) / "local")
