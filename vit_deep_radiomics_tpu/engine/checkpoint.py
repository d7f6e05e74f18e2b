"""Checkpointing: params + optimizer state + training progress.

The reference saves bare ``state_dict`` files gated on a target metric
(``model_epoch_NNNN.pth``, /root/reference/src/models_archs.py:14-19,
train_models.py:804-806) and has no resume (its TODO at :581).  Here a
checkpoint is the full training state — params, optimizer state, epoch,
metric history — so interrupted k-fold runs resume mid-fold, and the
best-model gate stays artifact-compatible (zero-padded epoch files under
``kfold_k/``).

:func:`save_checkpoint_async` is the production TPU path: it kicks off
``copy_to_host_async`` DMAs for every device leaf (non-blocking) and
hands serialisation + an ATOMIC tmp-file-rename write to a single
background writer thread, so the train step loop never stalls on disk.
Artifact format is byte-identical to the sync writer; a crash mid-write
leaves only a ``.tmp`` file, never a truncated checkpoint.
"""

from __future__ import annotations

import concurrent.futures
import copy
import json
import os
import re
from pathlib import Path

from flax import serialization

__all__ = [
    "save_checkpoint",
    "save_checkpoint_async",
    "wait_pending",
    "load_checkpoint",
    "latest_epoch",
    "best_epochs",
]

_FILE_RE = re.compile(r"model_epoch_(\d+)\.msgpack$")

# single writer thread: checkpoint writes are ordered, and one thread
# keeps host-memory pressure bounded to a single in-flight snapshot
_WRITER: concurrent.futures.ThreadPoolExecutor | None = None
_PENDING: list[concurrent.futures.Future] = []


def _path(save_dir, epoch: int) -> Path:
    return Path(save_dir) / f"model_epoch_{epoch:04d}.msgpack"


def _write(payload: dict, history, save_dir: Path, epoch: int) -> str:
    import jax

    # canonicalise dict key order (tree round-trip sorts keys) so the
    # sync and async writers emit byte-identical msgpack
    payload = jax.tree.map(lambda x: x, payload)
    path = _path(save_dir, epoch)
    tmp = path.with_suffix(".msgpack.tmp")
    with open(tmp, "wb") as fh:
        fh.write(serialization.to_bytes(payload))
    os.replace(tmp, path)      # atomic: readers never see partial files
    if history is not None:
        hist = save_dir / f"history_{epoch:04d}.json"
        hist_tmp = hist.with_suffix(".json.tmp")
        with open(hist_tmp, "w") as fh:
            json.dump(history, fh)
        os.replace(hist_tmp, hist)
    return str(path)


def save_checkpoint(state: dict, save_dir, epoch: int) -> str:
    """Serialise ``{'params': ..., 'opt_state': ..., 'epoch': ...,
    'history': ...}`` to ``model_epoch_NNNN.msgpack`` (blocking)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    payload = dict(state)
    history = payload.pop("history", None)
    return _write(payload, history, save_dir, epoch)


def save_checkpoint_async(state: dict, save_dir, epoch: int):
    """Mostly-non-blocking :func:`save_checkpoint`; returns Future[str].

    All device→host DMAs are kicked off first (``copy_to_host_async``)
    and materialised in one overlapped wait on the caller — this MUST
    happen before returning, because callers typically donate the same
    buffers into the next jitted step, which deletes them.  The
    dominant costs — msgpack serialisation and the atomic file write —
    run on the writer thread.  Call :func:`wait_pending` before reading
    the files or exiting.
    """
    global _WRITER
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    payload = dict(state)
    history = payload.pop("history", None)
    if history is not None:
        # snapshot NOW: the caller keeps appending to these lists while
        # the writer thread serialises
        history = copy.deepcopy(history)

    import numpy as np

    import jax

    def kick(x):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
        return x

    payload = jax.tree.map(kick, payload)          # parallel DMA start
    payload = jax.tree.map(                        # one overlapped wait
        lambda x: np.asarray(x) if hasattr(x, "copy_to_host_async")
        else x,
        payload,
    )
    # bound host memory to ONE in-flight snapshot: fence on the previous
    # write before submitting (a full-state snapshot is 2-3x params; a
    # slow disk must stall the trainer, not OOM the host)
    if _PENDING:
        wait_pending()
    if _WRITER is None:
        _WRITER = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
    fut = _WRITER.submit(_write, payload, history, save_dir, epoch)
    _PENDING.append(fut)
    return fut


def wait_pending() -> list[str]:
    """Block until every async checkpoint is on disk; returns paths.

    The pending list is cleared BEFORE raising, so one failed write
    (disk full) surfaces once instead of poisoning every later call —
    and the queued host snapshots are released either way.
    """
    pending, _PENDING[:] = list(_PENDING), []
    done, first_err = [], None
    for f in pending:
        try:
            done.append(f.result())
        except Exception as e:      # noqa: BLE001 — re-raised below
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err
    return done


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
