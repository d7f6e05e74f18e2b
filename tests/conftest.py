"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device sharding code paths (shard_map / pjit over a Mesh) are
exercised without TPU hardware by splitting the host platform into 8
virtual devices — the standard TPU-less way to test collective code.
Must run before jax initialises its backends, hence module-level in
conftest.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism for parity tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# NOTE: this image's sitecustomize force-registers the tunneled TPU
# ("axon") platform and overrides the JAX_PLATFORMS env var, so the env
# var alone does NOT select CPU.  jax.config.update after import does.
jax.config.update("jax_platforms", "cpu")

# Share compiled executables across test processes (the same on-disk
# cache the engine entry points use — see core.mesh).
from vit_deep_radiomics_tpu.core.mesh import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache(str(REPO_ROOT / ".pytest_xla_cache"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)
