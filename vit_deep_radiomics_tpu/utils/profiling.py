"""Tracing / profiling hooks and throughput counters.

The reference has no observability beyond tqdm bars (SURVEY.md §5).
Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory,
* :class:`Throughput` — images/sec/chip counter with device-sync-correct
  timing (a scalar pull per lap; ``block_until_ready`` is unreliable
  through this image's TPU tunnel),
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so engine
  phases (normalize / resample / vit / roi) show up named in traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "annotate", "Throughput", "sync", "device_sync",
           "device_memory_stats", "memory_summary_gib"]


def device_memory_stats(device=None) -> dict:
    """HBM telemetry for one device: {bytes_in_use, peak_bytes_in_use,
    bytes_limit, ...} when the runtime exposes ``memory_stats`` (TPU
    does), else {}.  Useful for serving/production capacity planning —
    the reference's closest analogue is torch.cuda.empty_cache() calls
    with no visibility at all (tfds_dense_descriptor.py:137)."""
    dev = device if device is not None else jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return {}
    return dict(stats) if stats else {}


def memory_summary_gib(device=None) -> dict:
    """``device_memory_stats`` reduced to the GiB numbers report lines
    want: ``{hbm_peak_gib, hbm_limit_gib}`` when the runtime exposes
    them (TPU does), {} otherwise (CPU).  Shared by bench.py and the
    serve CLI so the telemetry keys/units stay in one place."""
    stats = device_memory_stats(device)
    out = {}
    if "peak_bytes_in_use" in stats:
        out["hbm_peak_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    if "bytes_limit" in stats:
        out["hbm_limit_gib"] = round(stats["bytes_limit"] / 2**30, 3)
    return out


def device_sync(tree, pull: str = "scalar") -> None:
    """The ONE reliable execution barrier for this image's TPU tunnel.

    ``jax.block_until_ready`` RETURNS EARLY through the tunneled (axon)
    backend — measured twice in round 4: (a) a block_until_ready-
    "validated" cached executable still paid its ~40 s first-execution
    program/weights upload on the first real batch
    (artifacts/pipeline_serve_warmstart_r4.json); (b) timing loops
    closed with block_until_ready under-report wall time.  A
    device→host transfer is the only sync the tunnel honors, so every
    timing / warmup / validation site must use THIS helper instead:

    * ``pull="scalar"`` (default, timing loops): per array leaf,
      dispatch a reduce-to-scalar and pull it — one tiny D2H, no
      full-output wire cost.  The extra ``sum`` program is dispatched
      AFTER the work being timed, so it fences everything before it.
    * ``pull="full"`` (validation / serving warm): ``np.asarray`` every
      leaf — proves the actual output buffers are materialized on host,
      which is what a server's first-request latency depends on.

    Accepts any pytree; non-array leaves are ignored.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    for a in leaves:
        if not hasattr(a, "sum"):
            continue
        if pull == "full":
            np.asarray(a)
        else:
            float(jnp.asarray(a).sum())


def sync(*arrays) -> None:
    """Force completion of device work feeding *arrays* (scalar pull).

    Thin wrapper over :func:`device_sync` kept for existing call sites.
    """
    device_sync(list(arrays))


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof/TensorBoard timelines)."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Images/sec/chip counter.

    >>> tp = Throughput()
    >>> with tp.lap(n_images=8, out=result): ...
    >>> tp.images_per_sec_per_chip
    """

    def __init__(self, n_chips: int | None = None):
        self.n_chips = n_chips or jax.device_count()
        self.total_images = 0
        self.total_seconds = 0.0

    @contextlib.contextmanager
    def lap(self, n_images: int, out=None):
        t0 = time.perf_counter()
        yield
        if out is not None:
            sync(out)
        self.total_seconds += time.perf_counter() - t0
        self.total_images += n_images

    @property
    def images_per_sec(self) -> float:
        return self.total_images / self.total_seconds if self.total_seconds else 0.0

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / max(1, self.n_chips)

    def report(self) -> str:
        return (
            f"{self.total_images} imgs in {self.total_seconds:.2f}s = "
            f"{self.images_per_sec:.2f} img/s "
            f"({self.images_per_sec_per_chip:.2f}/chip over {self.n_chips})"
        )
