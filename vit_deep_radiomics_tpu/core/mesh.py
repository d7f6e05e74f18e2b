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
    "maybe_init_distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialise multi-host JAX when launched under a multi-process runtime.

    Single-host runs (the common case in tests and on one chip) are a
    no-op.  Multi-host coordination rides DCN; within-slice collectives
    ride ICI automatically once the mesh spans the slice.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


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
