"""Numerical-debug knobs: NaN checking and deterministic runs.

Single-controller JAX has no data races to sanitise (SURVEY.md §5); the
debugging surface that matters is numerics and reproducibility:

* :func:`nan_check_mode` — flips ``jax_debug_nans`` so the first NaN
  produced under jit raises with a traceback into the offending op,
* :func:`deterministic_mode` — disables nondeterministic reductions
  (``xla_gpu_deterministic_ops`` has no TPU analog needed; TPU runs are
  deterministic given fixed seeds, so this pins the RNG implementation
  and x64 flag for stable hashes),
* :func:`check_finite` — assertion helper for host-side pipelines.
"""

from __future__ import annotations

import contextlib

import numpy as np

import jax

__all__ = ["nan_check_mode", "deterministic_mode", "check_finite"]


@contextlib.contextmanager
def nan_check_mode(enabled: bool = True):
    """Raise on the first NaN inside jitted code (jax_debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def deterministic_mode():
    """Pin RNG implementation + disable x64 drift for reproducible runs."""
    prev_key = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    try:
        yield
    finally:
        jax.config.update("jax_default_prng_impl", prev_key)


def check_finite(name: str, *arrays) -> None:
    """Host-side finite check with a useful error message."""
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if not np.all(np.isfinite(a)):
            bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(
                f"{name}: array {i} has {bad}/{a.size} non-finite values"
            )
