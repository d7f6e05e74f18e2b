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
        """
        stats = {"done": 0, "skipped": 0, "failed": 0}
        for key in items:
            if key in self.state["done"]:
                stats["skipped"] += 1
                continue
            retries = self.state["retries"].get(key, 0)
            if key in self.state["failed"] and retries >= self.max_retries:
                stats["failed"] += 1
                continue
            try:
                worker(key)
            except KeyboardInterrupt:
                raise
            except Exception as exc:  # noqa: BLE001 - record, don't abort
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
                continue
            self.state["done"][key] = {"time": time.time()}
            self.state["failed"].pop(key, None)
            self._save()
            stats["done"] += 1
        return stats
