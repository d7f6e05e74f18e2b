"""Dtype policy: fp32 parity mode vs bf16 fast mode.

The reference runs everything in float32 on CUDA.  On TPU the MXU's
native fast path is bfloat16 with float32 accumulation, so the framework
threads an explicit :class:`Policy` through every model:

* ``parity``  — float32 compute and params: bit-consistent public entry
  points (BASELINE.json north-star) and golden tests.
* ``fast``    — bfloat16 compute, float32 params/accumulation: the
  production extraction/training path.

Matmuls always request ``preferred_element_type=float32`` (via the module
implementations) so accumulation precision does not depend on the policy.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["Policy", "PARITY", "FAST", "get_policy"]


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy threaded through models and engines."""

    name: str
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    output_dtype: jnp.dtype
    # dynamic int8 projections/MLP in the frozen backbone (ops/quant.py):
    # the MXU runs s8×s8→s32 at 2× the bf16 rate on v5e.  Inference-only —
    # the trainable paths ignore it (round() has no useful gradient).
    quantized: bool = False

    def cast_input(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_output(self, x):
        return jnp.asarray(x, self.output_dtype)


PARITY = Policy(
    name="parity",
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    output_dtype=jnp.float32,
)

FAST = Policy(
    name="fast",
    param_dtype=jnp.float32,
    compute_dtype=jnp.bfloat16,
    output_dtype=jnp.float32,
)

# Frozen-backbone inference: params stored bf16 so every matmul reads
# half the weight bytes and skips the fp32→bf16 cast (the backbone never
# trains, so no fp32 master copy is needed).
INFERENCE = Policy(
    name="inference",
    param_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    output_dtype=jnp.float32,
)

# Opt-in dynamic-int8 backbone inference: bf16 everywhere the INFERENCE
# policy is bf16, but the per-block projection/MLP matmuls run s8×s8→s32
# on the MXU with dynamic per-token activation scales (ops/quant.py).
INT8 = Policy(
    name="int8",
    param_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    output_dtype=jnp.float32,
    quantized=True,
)

_POLICIES = {
    "parity": PARITY, "fast": FAST, "inference": INFERENCE,
    "fp32": PARITY, "bf16": FAST, "int8": INT8,
}


def cast_params(params, dtype):
    """Cast every floating leaf of a param pytree (e.g. fp32 → bf16 for
    the INFERENCE policy after conversion/init)."""
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(cast, params)


def get_policy(name: str | Policy) -> Policy:
    if isinstance(name, Policy):
        return name
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(
            f"unknown precision policy {name!r}; choose from {sorted(_POLICIES)}"
        ) from None
