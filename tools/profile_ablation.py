"""Ablation profile of the flagship SAM ViT-B/16 forward on the chip.

Times jitted sub-models (full / no-neck / patch-only / patch+neck) and
reports the implied per-component cost.  Ablation differences are more
trustworthy than in-jit annotations through the axon tunnel, where
`block_until_ready` is unreliable (timing forces a D2H sum instead).

Usage: python tools/profile_ablation.py [batch]
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def time_model(model, params, x, reps=12):
    import jax
    import jax.numpy as jnp

    fn = jax.jit(model.apply)
    float(jnp.sum(fn(params, x).astype(jnp.float32)))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(params, x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.mesh import (
        enable_persistent_compile_cache,
    )
    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    enable_persistent_compile_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(batch, 1024, 1024, 3))
        .astype(np.float32)
    )

    variants = {
        "full": ViTDense(SAM_VIT_B, policy=FAST),
        "no_neck": ViTDense(
            dataclasses.replace(SAM_VIT_B, neck_channels=0), policy=FAST
        ),
        "patch_only": ViTDense(SAM_VIT_B, policy=FAST, patch_embed_only=True),
        "patch_neck": ViTDense(
            dataclasses.replace(SAM_VIT_B, depth=0), policy=FAST
        ),
    }
    times = {}
    full_params = jax.jit(variants["full"].init)(jax.random.PRNGKey(0), x)
    for name, model in variants.items():
        params = (
            full_params
            if name == "full"
            else jax.jit(model.init)(jax.random.PRNGKey(0), x)
        )
        times[name] = time_model(model, params, x)
        print(f"{name:12s} {times[name] * 1e3:8.2f} ms "
              f"({batch / times[name]:7.1f} img/s)", flush=True)

    blocks = times["full"] - times["patch_neck"]
    neck = times["full"] - times["no_neck"]
    print(f"\nimplied: blocks {blocks * 1e3:.2f} ms | "
          f"neck {neck * 1e3:.2f} ms | "
          f"patch {times['patch_only'] * 1e3:.2f} ms | "
          f"per-block {blocks / 12 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
