"""Multi-host launch runtime: DCN coordination + per-process work split.

The reference is strictly single-process / single-GPU (CLI-selected
device id, /root/reference/src/train_models.py:509-510; its run scripts
just queue jobs sequentially, run_train.sh:4-13).  The TPU-native
framework is a single-controller-per-process JAX program: on a multi-
host slice each host runs the same entry point, `jax.distributed`
coordinates over **DCN**, and collectives inside a jitted mesh program
ride **ICI** automatically.  This module is the launch glue:

* ``detect_launch_env()`` — find (coordinator, num_processes,
  process_id) from explicit ``VDR_*`` variables or a managed launcher's
  environment (SLURM, OpenMPI).  TPU pod runtimes that set their own
  metadata need no variables at all — ``jax.distributed.initialize()``
  self-discovers — so detection only has to cover generic clusters.
* ``initialize_from_env()`` — idempotent process-group init; a no-op
  single-host.
* ``is_primary()`` / ``primary_only`` — gate artifact writes (HDF5,
  parquet, checkpoints, reports) to process 0; every process computes,
  one process publishes.
* ``shard_for_process(items)`` — deterministic round-robin split of a
  work list (patients, experiments) across processes for
  embarrassingly-parallel sweeps.

Explicit launch variables (all three required together)::

    VDR_COORDINATOR=host0:9999 VDR_NUM_PROCESSES=2 VDR_PROCESS_ID=0 \
        python -m vit_deep_radiomics_tpu.cli.extract ...
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Sequence, TypeVar

__all__ = [
    "LaunchEnv",
    "detect_launch_env",
    "initialize_from_env",
    "is_primary",
    "primary_only",
    "process_count",
    "process_index",
    "claim_primary_entry",
    "shard_for_process",
]

T = TypeVar("T")

_DEFAULT_PORT = 8476


@dataclasses.dataclass(frozen=True)
class LaunchEnv:
    """A resolved multi-process launch description."""

    coordinator: str
    num_processes: int
    process_id: int
    source: str  # 'vdr' | 'slurm' | 'ompi'

    def __post_init__(self):
        if not 0 <= self.process_id < self.num_processes:
            raise ValueError(
                f"process_id {self.process_id} outside "
                f"[0, {self.num_processes})")


def _first_slurm_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist (``a[1-3],b`` → ``a1``).

    Handles the common compressed forms without needing ``scontrol``:
    prefix[ranges] groups separated by commas at bracket depth 0.
    """
    # split at depth-0 commas
    groups, depth, cur = [], 0, []
    for ch in nodelist:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            groups.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        groups.append("".join(cur))
    if not groups:
        return ""  # empty nodelist → caller's `if not host` fallback
    first = groups[0]
    if "[" not in first:
        return first
    prefix, rng = first.split("[", 1)
    rng = rng.rstrip("]")
    head = rng.split(",")[0].split("-")[0]
    return prefix + head


def detect_launch_env(environ=None) -> LaunchEnv | None:
    """Resolve a multi-process launch from the environment, or None.

    Precedence: explicit ``VDR_*`` triplet, then SLURM, then OpenMPI.
    Single-process environments (or a detected world size of 1) return
    None — the caller should then run exactly as on one host.
    """
    env = os.environ if environ is None else environ

    if env.get("VDR_COORDINATOR"):
        missing = [k for k in ("VDR_NUM_PROCESSES", "VDR_PROCESS_ID")
                   if not env.get(k)]
        if missing:
            raise RuntimeError(
                "VDR_COORDINATOR is set but "
                f"{' and '.join(missing)} "
                "missing — a VDR_* launch needs all three of "
                "VDR_COORDINATOR, VDR_NUM_PROCESSES, VDR_PROCESS_ID "
                "(unset VDR_COORDINATOR for a single-process run)")
        return LaunchEnv(
            coordinator=env["VDR_COORDINATOR"],
            num_processes=int(env["VDR_NUM_PROCESSES"]),
            process_id=int(env["VDR_PROCESS_ID"]),
            source="vdr",
        )

    if env.get("SLURM_PROCID") is not None and env.get("SLURM_NTASKS"):
        n = int(env["SLURM_NTASKS"])
        if n <= 1:
            return None
        host = env.get("SLURM_LAUNCH_NODE_IPADDR") or _first_slurm_host(
            env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", "")))
        if not host:
            return None
        return LaunchEnv(
            coordinator=f"{host}:{env.get('VDR_PORT', _DEFAULT_PORT)}",
            num_processes=n,
            process_id=int(env["SLURM_PROCID"]),
            source="slurm",
        )

    if env.get("OMPI_COMM_WORLD_SIZE"):
        n = int(env["OMPI_COMM_WORLD_SIZE"])
        if n <= 1:
            return None
        host = env.get("VDR_COORDINATOR_HOST")
        if not host:
            return None
        rank = env.get("OMPI_COMM_WORLD_RANK")
        if rank is None:
            raise RuntimeError(
                f"OMPI_COMM_WORLD_SIZE={n} and VDR_COORDINATOR_HOST are "
                "set but OMPI_COMM_WORLD_RANK is missing — an OpenMPI "
                "launch needs both OMPI_COMM_WORLD_SIZE and "
                "OMPI_COMM_WORLD_RANK (unset OMPI_COMM_WORLD_SIZE or "
                "VDR_COORDINATOR_HOST for a single-process run)")
        return LaunchEnv(
            coordinator=f"{host}:{env.get('VDR_PORT', _DEFAULT_PORT)}",
            num_processes=n,
            process_id=int(rank),
            source="ompi",
        )

    return None


_initialized = False


def initialize_from_env() -> LaunchEnv | None:
    """Initialise ``jax.distributed`` once from the detected launch env.

    Safe to call from every entry point: single-host is a no-op, and
    repeat calls after a successful init return the cached description.
    TPU pod runtimes with self-discovering metadata can also force a
    plain ``jax.distributed.initialize()`` via ``VDR_DISTRIBUTED=auto``
    (or by setting JAX's own ``JAX_COORDINATOR_ADDRESS`` family of
    variables, which ``jax.distributed.initialize()`` reads itself).
    """
    global _initialized
    import jax

    if (os.environ.get("VDR_DISTRIBUTED", "").lower() == "auto"
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        if not _initialized:
            jax.distributed.initialize()
            _initialized = True
        return None
    env = detect_launch_env()
    if env is None:
        return None
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=env.coordinator,
            num_processes=env.num_processes,
            process_id=env.process_id,
        )
        _initialized = True
    return env


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns artifact publication (host writes)."""
    return process_index() == 0


def primary_only(fn: Callable[..., T]) -> Callable[..., T | None]:
    """Run ``fn`` only on process 0; other processes get None.

    For host-side artifact writes (HDF5/parquet/JSON/HTML) in multi-host
    sweeps where every process computes the same replicated result.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def claim_primary_entry(entry: str) -> bool:
    """``initialize_from_env()`` and return True only on the publisher.

    For CLIs whose work is a single-process host job (aggregation,
    merging, splitting, converters, late fusion, UMAP, serving): under a
    multi-process launch every process would otherwise repeat the same
    work and race writes to the same artifact paths, so non-primary
    processes log and skip (return False → the CLI exits 0 idle).
    Single-process launches always return True.
    """
    initialize_from_env()
    if process_count() > 1 and not is_primary():
        print(f"[{entry}] multi-process launch: this entry point is a "
              f"host-side job that runs on the primary only; process "
              f"{process_index()} idles")
        return False
    return True


def shard_for_process(
    items: Sequence[T],
    pid: int | None = None,
    nproc: int | None = None,
) -> list[T]:
    """Deterministic round-robin shard of a work list for this process.

    Round-robin (not contiguous blocks) so sorted-by-size work lists
    balance across processes.  With defaults, uses the live JAX process
    grid; pass explicit ``pid``/``nproc`` for host-side planning or
    tests.
    """
    if pid is None:
        pid = process_index()
    if nproc is None:
        nproc = process_count()
    if not 0 <= pid < nproc:
        raise ValueError(f"pid {pid} outside [0, {nproc})")
    return list(items[pid::nproc])
