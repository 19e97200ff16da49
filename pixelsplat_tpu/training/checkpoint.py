"""Orbax checkpointing (save/restore of the full train state).

Counterpart of Lightning's ModelCheckpoint in the reference
(/root/reference/src/main.py:75-81): checkpoints carry params, optimizer
state and step, saved every_n_train_steps, all kept (save_top_k=-1).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: Path, step: int, state: Any) -> Path:
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path

def load_checkpoint(path: Path, template: Optional[Any] = None) -> Any:
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template
            )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def latest_checkpoint(directory: Path) -> Optional[Path]:
    directory = Path(directory)
    if not directory.exists():
        return None
    candidates = sorted(
        (p for p in directory.iterdir() if p.name.startswith("step_")),
        key=lambda p: int(p.name.split("_")[1]),
    )
    return candidates[-1] if candidates else None
