"""Parallelism primitives: explicit shard_map DP + model-parallel rules.

The reference has no distributed backend at all (single CUDA device,
SURVEY.md §2/§5); parallelism here is first-class and comes in two
idiomatic TPU forms:

* **GSPMD (implicit)** — the default in engine/train.py: annotate the
  batch with a ``data``-axis sharding, keep params replicated, and let
  XLA insert the gradient all-reduce.  Zero code in the step function.
* **shard_map (explicit)** — :func:`data_parallel_step` below: the
  per-device step runs on local shards and reduces gradients with
  ``jax.lax.pmean`` over ICI.  Useful when the collective schedule must
  be pinned (e.g. overlapping with Pallas kernels) and as an executable
  spec of the communication pattern.

Model parallelism for the ViT backbone is expressed as parameter
PartitionSpec rules (:func:`vit_param_specs`): attention qkv/proj shard
over heads and the MLP hidden dim over the ``model`` axis — the
standard Megatron layout, with XLA inserting the block-boundary
all-reduces.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "data_parallel_step",
    "vit_param_specs",
    "shard_params",
    "shard_batch",
    "zero1_specs",
    "shard_opt_state",
]


def data_parallel_step(
    loss_fn: Callable,
    mesh: Mesh,
) -> Callable:
    """Wrap ``loss_fn(params, batch) -> scalar`` into an spmd grad step.

    Returns ``step(params, batch) -> (loss, grads)`` where *batch* is
    sharded over ``data`` on axis 0 of every leaf, params are replicated,
    and both loss and grads are pmean-reduced across the mesh — the
    explicit form of what GSPMD does implicitly in engine/train.py.
    """

    def local_step(params, batch):
        # differentiate THROUGH the pmean: shard_map auto-psums the
        # cotangent of replicated params, so taking grads of the local
        # loss and averaging after would yield the gradient of the
        # device-sum instead of the global mean.
        def global_mean_loss(p):
            return jax.lax.pmean(loss_fn(p, batch), DATA_AXIS)

        return jax.value_and_grad(global_mean_loss)(params)

    batch_spec = P(DATA_AXIS)
    return jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=(P(), P()),
        )
    )


def vit_param_specs(params: dict) -> dict:
    """PartitionSpec pytree for ViTDense params: Megatron-style sharding.

    * attention ``qkv_kernel (C, 3C)`` → shard output dim (heads) over
      ``model``; ``proj_kernel (C, C)`` → shard input dim,
    * MLP ``w1 (C, H)`` → shard hidden out; ``w2 (H, C)`` → shard hidden
      in,
    * everything else replicated.
    """

    def spec_for(path: tuple[str, ...], leaf) -> P:
        name = path[-1] if path else ""
        parent = path[-2] if len(path) >= 2 else ""
        if parent == "attn" and name == "qkv_kernel":
            return P(None, MODEL_AXIS)
        if parent == "attn" and name == "qkv_bias":
            return P(MODEL_AXIS)
        if parent == "attn" and name == "proj_kernel":
            return P(MODEL_AXIS, None)
        if parent == "mlp" and name == "w1":
            return P(None, MODEL_AXIS)
        if parent == "mlp" and name == "b1":
            return P(MODEL_AXIS)
        if parent == "mlp" and name == "w2":
            return P(MODEL_AXIS, None)
        return P()

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return spec_for(path, tree)

    return walk(params)


def shard_params(params: dict, mesh: Mesh, specs: dict | None = None):
    """device_put params with per-leaf NamedShardings (default: model-
    parallel ViT rules)."""
    specs = specs if specs is not None else vit_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def shard_batch(batch, mesh: Mesh):
    """Shard every array leaf over ``data`` on axis 0."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree.map(put, batch)


# --------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis
# --------------------------------------------------------------------------

def zero1_specs(opt_state, mesh: Mesh):
    """PartitionSpec pytree sharding optimizer-state leaves over ``data``.

    ZeRO stage 1 the GSPMD way: each array leaf (Adam ``mu``/``nu``
    moments, etc.) is sharded along its FIRST axis divisible by the
    ``data``-axis size; scalars and indivisible leaves stay replicated.
    Params and gradients stay replicated, so the training step is
    unchanged — the optimizer update just runs 1/N-sized per device and
    XLA all-gathers the updates at ``optax.apply_updates``.  Optimizer
    memory drops from 2×params to 2×params/N — what makes large-backbone
    (ViT-L/G) fine-tuning fit alongside activations.

    The reference has no distributed training at all (SURVEY §2/§5);
    this is a new first-class capability of the TPU framework.
    """
    n = mesh.shape[DATA_AXIS]

    def spec_for(x) -> P:
        if not hasattr(x, "ndim") or x.ndim == 0:
            return P()
        for axis, dim in enumerate(x.shape):
            if dim % n == 0 and dim >= n:
                return P(*([None] * axis), DATA_AXIS,
                         *([None] * (x.ndim - axis - 1)))
        return P()

    return jax.tree.map(spec_for, opt_state)


def shard_opt_state(opt_state, mesh: Mesh, specs=None):
    """device_put the optimizer state with :func:`zero1_specs`.

    Returns ``(sharded_state, shardings)`` — pass ``shardings`` as the
    step's ``out_shardings``/``with_sharding_constraint`` so the state
    STAYS sharded across jitted updates instead of being re-replicated
    by GSPMD's default propagation.
    """
    specs = specs if specs is not None else zero1_specs(opt_state, mesh)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda s: isinstance(s, P))
    state = jax.tree.map(jax.device_put, opt_state, shardings)
    return state, shardings
