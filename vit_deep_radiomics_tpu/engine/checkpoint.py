"""Checkpointing: params + optimizer state + training progress.

The reference saves bare ``state_dict`` files gated on a target metric
(``model_epoch_NNNN.pth``, /root/reference/src/models_archs.py:14-19,
train_models.py:804-806) and has no resume (its TODO at :581).  Here a
checkpoint is the full training state — params, optimizer state, epoch,
metric history — so interrupted k-fold runs resume mid-fold, and the
best-model gate stays artifact-compatible (zero-padded epoch files under
``kfold_k/``).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_epoch", "best_epochs"]

_FILE_RE = re.compile(r"model_epoch_(\d+)\.msgpack$")


def _path(save_dir, epoch: int) -> Path:
    return Path(save_dir) / f"model_epoch_{epoch:04d}.msgpack"


def save_checkpoint(state: dict, save_dir, epoch: int) -> str:
    """Serialise ``{'params': ..., 'opt_state': ..., 'epoch': ...,
    'history': ...}`` to ``model_epoch_NNNN.msgpack``."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    path = _path(save_dir, epoch)
    payload = dict(state)
    history = payload.pop("history", None)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(payload))
    if history is not None:
        with open(save_dir / f"history_{epoch:04d}.json", "w") as fh:
            json.dump(history, fh)
    return str(path)


def load_checkpoint(template: dict, save_dir, epoch: int) -> dict:
    """Restore a checkpoint into the structure of *template*."""
    path = _path(save_dir, epoch)
    with open(path, "rb") as fh:
        state = serialization.from_bytes(dict(template), fh.read())
    hist_path = Path(save_dir) / f"history_{epoch:04d}.json"
    if hist_path.exists():
        with open(hist_path) as fh:
            state["history"] = json.load(fh)
    return state


def latest_epoch(save_dir) -> int | None:
    """Highest checkpointed epoch in a fold directory (resume point)."""
    save_dir = Path(save_dir)
    if not save_dir.is_dir():
        return None
    epochs = [
        int(m.group(1))
        for fn in os.listdir(save_dir)
        if (m := _FILE_RE.search(fn))
    ]
    return max(epochs) if epochs else None


def best_epochs(save_dir) -> list[int]:
    """All checkpointed epochs, sorted (the gate only saves improvers)."""
    save_dir = Path(save_dir)
    if not save_dir.is_dir():
        return []
    return sorted(
        int(m.group(1))
        for fn in os.listdir(save_dir)
        if (m := _FILE_RE.search(fn))
    )
