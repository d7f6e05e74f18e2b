"""Benchmark harness: flagship dense-descriptor throughput.

Measures images/sec/chip for the SAM/MedSAM ViT-B/16 encoder @1024 in
bf16 with Pallas flash attention — the reference pipeline's FLOP hot
spot (its per-slice CUDA forward at
/root/reference/src/tfds_dense_descriptor.py:110-139).

Baseline: the same architecture driven through torch-CPU (the
``transformers`` SAM vision encoder) — the reference's own engine on the
hardware available here; measured once and cached in
``bench_baseline.json``.  The reference publishes no numbers of its own
(BASELINE.md), so the baseline is established, not matched.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _enable_cache():
    from vit_deep_radiomics_tpu.core.mesh import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

BASELINE_CACHE = REPO / "bench_baseline.json"
BATCH = 4
STEPS = 12


def measure_vitl14_dense() -> float:
    """Secondary config (BASELINE.json config 3): DINOv2-style ViT-L/14
    full dense tokens @518, bf16 batched inference.  Run via
    ``python bench.py vitl14``."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import DINOV2_CONFIGS, ViTDense

    model = ViTDense(
        DINOV2_CONFIGS["dinov2_vitl14"], policy=FAST,
        use_flash=jax.default_backend() == "tpu",
    )
    images = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(BATCH, 518, 518, 3))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    apply = jax.jit(model.apply)
    float(apply(params, images).sum())
    best = float("inf")
    for _rep in range(3):  # tunnel latency is noisy; take the best rep
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = apply(params, images)
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return BATCH / best


def measure_tpu() -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    use_flash = jax.default_backend() == "tpu"
    model = ViTDense(SAM_VIT_B, policy=FAST, use_flash=use_flash)
    images = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(BATCH, 1024, 1024, 3))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    apply = jax.jit(model.apply)

    # warmup / compile; device sync via scalar pull (block_until_ready is
    # unreliable through the axon tunnel).  Sync once after the loop —
    # dispatch is async, so per-iteration pulls would add a host round
    # trip per step.
    float(apply(params, images).sum())
    best = float("inf")
    for _rep in range(3):  # tunnel latency is noisy; take the best rep
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = apply(params, images)
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return BATCH / best


def measure_torch_cpu_baseline() -> float:
    """Reference-engine throughput: transformers SAM ViT-B on torch CPU."""
    import torch
    from transformers import SamVisionConfig, SamVisionModel

    cfg = SamVisionConfig()  # ViT-B/16 @1024, 256-ch neck
    torch.manual_seed(0)
    model = SamVisionModel(cfg).eval()
    img = torch.rand(1, 3, 1024, 1024)
    with torch.no_grad():
        model(img)  # warmup
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            model(img)
        dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def get_baseline() -> float:
    if BASELINE_CACHE.exists():
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)["torch_cpu_img_per_s"]
    baseline = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, "w") as fh:
        json.dump(
            {
                "torch_cpu_img_per_s": baseline,
                "config": "SAM ViT-B/16 @1024 fp32, torch CPU, batch 1",
            },
            fh,
        )
    return baseline


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    _enable_cache()
    if argv and argv[0] == "vitl14":
        value = measure_vitl14_dense()
        print(json.dumps({
            "metric": "dinov2_vitl14_dense518_throughput",
            "value": round(value, 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,  # no reference engine for this config here
        }))
        return
    value = measure_tpu()
    baseline = get_baseline()
    print(json.dumps({
        "metric": "sam_vitb16_dense_descriptor_throughput",
        "value": round(value, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
