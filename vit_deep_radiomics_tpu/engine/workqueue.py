"""Persistent work queue: failure detection + resumable sweeps.

The reference's only fault tolerance is skip-if-output-exists in the
extraction loop (tfds_dense_descriptor.py:425; SURVEY.md §5 "Failure
detection").  This queue makes that contract explicit and adds what the
reference lacks:

* a JSON state file recording pending / done / failed items with error
  messages and retry counts (inspectable after a crash),
* bounded retries with the failure recorded instead of aborting the
  whole sweep (one corrupt patient no longer kills an overnight run),
* idempotency: completed items are skipped on re-run, matching the
  per-patient output contract.
"""

from __future__ import annotations

import json
import time
import traceback
from pathlib import Path
from typing import Callable, Iterable

__all__ = ["WorkQueue"]


class WorkQueue:
    """File-backed work queue over string item keys."""

    def __init__(self, state_path, max_retries: int = 2):
        self.state_path = Path(state_path)
        self.max_retries = max_retries
        if self.state_path.exists():
            with open(self.state_path) as fh:
                self.state = json.load(fh)
        else:
            self.state = {"done": {}, "failed": {}, "retries": {}}

    def _save(self) -> None:
        self.state_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.state_path.with_suffix(".tmp")
        with open(tmp, "w") as fh:
            json.dump(self.state, fh, indent=1)
        tmp.replace(self.state_path)

    @property
    def done(self) -> dict:
        return self.state["done"]

    @property
    def failed(self) -> dict:
        return self.state["failed"]

    def run(
        self,
        items: Iterable[str],
        worker: Callable[[str], object],
        log: Callable[[str], None] = print,
    ) -> dict:
        """Process items; returns {'done': n, 'skipped': n, 'failed': n}.

        Failed items retry up to ``max_retries`` times across runs, then
        stay in ``failed`` with the last traceback.

        Pipelining: if ``worker(key)`` returns a CALLABLE, it is treated
        as a deferred finalizer (e.g. the HDF5/parquet write) and runs on
        a background thread overlapped with the NEXT item's compute.  An
        item is marked done only after its finalizer completes, and a
        finalizer failure is recorded against its own key — crash-resume
        semantics are identical to the synchronous path.
        """
        from concurrent.futures import ThreadPoolExecutor

        stats = {"done": 0, "skipped": 0, "failed": 0}
        pending: tuple | None = None  # (key, future, retries)

        def _record_failure(key: str, retries: int, exc: Exception) -> None:
            self.state["retries"][key] = retries + 1
            self.state["failed"][key] = {
                "error": repr(exc),
                "traceback": traceback.format_exc(limit=10),
                "time": time.time(),
                "retries": retries + 1,
            }
            self._save()
            stats["failed"] += 1
            log(f"FAILED {key} (attempt {retries + 1}): {exc!r}")

        def _mark_done(key: str) -> None:
            self.state["done"][key] = {"time": time.time()}
            self.state["failed"].pop(key, None)
            self._save()
            stats["done"] += 1

        def _resolve_pending() -> None:
            nonlocal pending
            if pending is None:
                return
            p_key, fut, p_retries = pending
            pending = None
            try:
                fut.result()
            except Exception as exc:  # noqa: BLE001 - record, don't abort
                _record_failure(p_key, p_retries, exc)
            else:
                _mark_done(p_key)

        with ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="workqueue-finalize"
        ) as pool:
            for key in items:
                if key in self.state["done"]:
                    stats["skipped"] += 1
                    continue
                retries = self.state["retries"].get(key, 0)
                if (
                    key in self.state["failed"]
                    and retries >= self.max_retries
                ):
                    stats["failed"] += 1
                    continue
                try:
                    result = worker(key)
                except KeyboardInterrupt:
                    raise
                except Exception as exc:  # noqa: BLE001
                    _record_failure(key, retries, exc)
                    continue
                _resolve_pending()  # join the previous item's finalizer
                if callable(result):
                    pending = (key, pool.submit(result), retries)
                else:
                    _mark_done(key)
            _resolve_pending()
        return stats
