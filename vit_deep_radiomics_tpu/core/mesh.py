"""Device-mesh runtime: single-controller JAX over ICI/DCN.

The reference pipeline is single-CUDA-device (train_models.py:509, 589 in
/root/reference) with gradient accumulation standing in for data
parallelism.  Here parallelism is first-class: every engine entry point
takes a :class:`jax.sharding.Mesh` built by :func:`make_mesh`, shards the
batch dimension over the ``data`` axis, and reduces gradients with
``psum`` over ICI.

The mesh axes used throughout the framework:

``data``
    batch / patient-level data parallelism (gradient psum).
``model``
    optional tensor parallelism for the ViT backbone (attention heads and
    MLP hidden dim sharded; all-reduce on block outputs).

For TPU-less testing set ``XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu`` and the same code paths run over 8 virtual CPU devices
(see tests/conftest.py).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "enable_persistent_compile_cache",
    "mesh_spans_processes",
    "put_global",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"

_CACHE_ENV = "VDR_COMPILE_CACHE"


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    On this image each process recompiles every executable from scratch
    (no cross-process in-memory sharing), and a cold SAM ViT-B@1024
    forward costs ~2 minutes of compile wall — more than the compute of
    a 20-patient extraction sweep.  The on-disk executable cache removes
    that wall for every process after the first.  Called by the CLIs and
    engine entry points; respects an explicit ``jax_compilation_cache_dir``
    the user already set, and ``VDR_COMPILE_CACHE=off`` disables it.
    """
    env = os.environ.get(_CACHE_ENV, "")
    if env.lower() in ("off", "0", "none"):
        return None
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "vdr_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable: the per-program tunnel overhead dominates
    # even small programs here
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    *,
    model_parallel: int = 1,
    axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2D ``(data, model)`` mesh over the available devices.

    Args:
        devices: devices to use (default ``jax.devices()``).
        model_parallel: size of the ``model`` axis; must divide the device
            count.  The remaining devices form the ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n} devices"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits axis 0 over ``data`` and replicates the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, small state)."""
    return NamedSharding(mesh, P())


def mesh_spans_processes(mesh: Mesh | None) -> bool:
    """True when the mesh includes devices from more than one process.

    In that regime host values must enter programs as *global* arrays
    (:func:`put_global`) and only addressable shards can leave — the
    multi-host trainer/extractor paths branch on this.
    """
    if mesh is None:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def _ragged_for(sharding: NamedSharding, shape: tuple[int, ...]) -> bool:
    """True when some sharded dim of ``shape`` does not divide over its
    mesh axes (the legitimate replicate-fallback case for put_global)."""
    spec = sharding.spec
    if len(spec) > len(shape):
        raise ValueError(
            f"PartitionSpec {spec} has rank {len(spec)} but the array "
            f"has rank {len(shape)} — malformed sharding for put_global")
    for dim, axes in enumerate(spec):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else tuple(axes)
        n = int(np.prod([sharding.mesh.shape[a] for a in axes]))
        if shape[dim] % n != 0:
            return True
    return False


def put_global(x, sharding: NamedSharding):
    """Host value → (possibly multi-process) global ``jax.Array``.

    Every process passes the IDENTICAL full host value (the framework's
    multi-host contract: batch construction is deterministic, so each
    process rebuilds the same global batch); each device receives just
    its slice, so no host ships more than its addressable share.
    Equivalent to ``jax.device_put(x, sharding)`` single-process, but
    also valid when ``sharding`` spans non-addressable devices.

    Falls back to a replicated layout when the sharded axis does not
    divide evenly (ragged trailing batches) — correct, just without the
    transfer savings.  The fallback is only taken for that specific
    divisibility case; a malformed spec (wrong rank / unknown axis)
    raises, so programming errors stay loud.
    """
    x = np.asarray(x)
    if not sharding.is_fully_replicated and _ragged_for(sharding, x.shape):
        sharding = NamedSharding(sharding.mesh, P())
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    arrays = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(
        x.shape, sharding, arrays)
