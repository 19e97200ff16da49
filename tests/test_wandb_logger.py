"""WandbLogger backend: scalars/images/videos/model artifacts through a
fake wandb module (the real package is absent in this environment), with
the LocalLogger fallback when wandb is unavailable or disabled."""

import sys
import types
from dataclasses import dataclass, field

import numpy as np
import pytest


@dataclass
class _Cfg:
    project: str = "proj"
    entity: str = ""
    name: str = "run"
    mode: str = "online"
    tags: tuple = field(default_factory=tuple)


class _FakeRun:
    def __init__(self):
        self.id = "abc123"
        self.artifacts = []
        self.finished = False

    def log_artifact(self, artifact, aliases=None):
        self.artifacts.append((artifact, aliases))

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    fake = types.ModuleType("wandb")
    fake.calls = []
    run = _FakeRun()

    def init(**kw):
        fake.calls.append(("init", kw))
        return run

    def log(data, step=None):
        fake.calls.append(("log", data, step))

    class Image:
        def __init__(self, path):
            self.path = path

    class Video:
        def __init__(self, path, fps=30):
            self.path = path

    class Artifact:
        def __init__(self, name, type):
            self.name = name
            self.type = type
            self.dirs = []

        def add_dir(self, d):
            self.dirs.append(d)

    fake.init, fake.log = init, log
    fake.Image, fake.Video, fake.Artifact = Image, Video, Artifact
    fake.run = run
    monkeypatch.setitem(sys.modules, "wandb", fake)

    import pixelsplat_tpu.utils.wandb_tools as wt

    monkeypatch.setattr(wt, "wandb", fake)
    monkeypatch.setattr(wt, "WANDB_AVAILABLE", True)
    return fake, wt


def test_wandb_logger_full_surface(tmp_path, monkeypatch):
    fake, wt = _install_fake_wandb(monkeypatch)
    logger = wt.select_logger(_Cfg(), tmp_path, config_dict={"a": 1})
    assert isinstance(logger, wt.WandbLogger)
    assert fake.calls[0][0] == "init"
    assert fake.calls[0][1]["config"] == {"a": 1}

    logger.log_metrics({"loss": 0.5}, step=3)
    assert ("log", {"loss": 0.5}, 3) in fake.calls
    # Local mirror always written.
    assert (tmp_path / "local" / "metrics.jsonl").exists()

    img = np.zeros((3, 8, 8), np.float32)
    logger.log_image("cmp", img, step=3)
    assert (tmp_path / "local" / "cmp" / "000003.png").exists()
    assert any(
        c[0] == "log" and "cmp" in c[1] and isinstance(c[1]["cmp"], fake.Image)
        for c in fake.calls
    )

    frames = np.zeros((4, 3, 16, 16), np.float32)
    path = logger.log_video("video/wobble", frames, step=3)
    assert path.exists()
    assert any(
        c[0] == "log" and "video/wobble" in c[1] for c in fake.calls
    )

    ckpt = tmp_path / "checkpoints" / "7"
    ckpt.mkdir(parents=True)
    (ckpt / "x.bin").write_bytes(b"0")
    logger.log_model(ckpt, step=7)
    artifact, aliases = fake.run.artifacts[0]
    assert artifact.type == "model" and aliases == ["step-7"]

    logger.finish()
    assert fake.run.finished


def test_select_logger_falls_back_without_wandb(tmp_path):
    import pixelsplat_tpu.utils.wandb_tools as wt
    from pixelsplat_tpu.utils.local_logger import LocalLogger

    # Real environment: wandb not importable -> LocalLogger even if enabled.
    if not wt.WANDB_AVAILABLE:
        logger = wt.select_logger(_Cfg(mode="online"), tmp_path)
        assert isinstance(logger, LocalLogger)

    # Disabled mode -> LocalLogger regardless.
    logger = wt.select_logger(_Cfg(mode="disabled"), tmp_path)
    assert isinstance(logger, LocalLogger)
    # LocalLogger exposes the same video/model surface.
    frames = np.zeros((2, 3, 8, 8), np.float32)
    assert logger.log_video("video/x", frames, step=1).exists()
    logger.log_model(tmp_path, step=1)  # no-op
