"""Ablation profile of the flagship SAM ViT-B/16 forward on the chip.

Times jitted sub-models (full / no-neck / patch-only / patch+neck) and
reports the implied per-component cost.  Ablation differences are more
trustworthy than in-jit annotations through the axon tunnel, where
`block_until_ready` is unreliable (timing forces a D2H sum instead).

Usage: python tools/profile_ablation.py [batch]
       python tools/profile_ablation.py components [batch]

``components`` mode times the full model with single components
monkeypatched to identity (attention / MLP / LayerNorm), plus the
nomax / fused-MLP env toggles, and prints the implied in-context cost
of each — the post-nomax profile harvest.  Differences-of-ablations
cancel the ~0.65-2 ms per-call tunnel dispatch constant that makes
standalone microbenchmarks lie (docs/ROADMAP.md round-2 notes).
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


def train_components_main(batch: int) -> None:
    """Identity-ablation profile of the TRAINABLE fwd+bwd step.

    Times ``value_and_grad(sum(apply²))`` of the trainable SAM ViT-B
    with components replaced by identity: attention (all / windowed-only
    / global-only via the token count at the call site), MLP.  The
    differences localise the 24.6%-training-MFU gap (bench finetune)
    between the attention fwd/bwd kernels + their XLA glue and the rest.
    """
    import contextlib

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.mesh import (
        enable_persistent_compile_cache,
    )
    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models import vit as vit_mod
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    enable_persistent_compile_cache()
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(batch, 1024, 1024, 3))
        .astype(np.float32)
    )

    saved_call = vit_mod.WindowedAttention.__call__

    def identity_all(self, y=None, *a, **k):
        return y

    def identity_windowed(self, y=None, *a, **k):
        # windowed layers arrive partitioned: (B·nwin, 14, 14, C)
        return y if y.shape[1] <= 16 else saved_call(self, y)

    def identity_global(self, y=None, *a, **k):
        return saved_call(self, y) if y.shape[1] <= 16 else y

    @contextlib.contextmanager
    def patched(cls_name, fn):
        if cls_name is None:
            yield
            return
        cls = getattr(vit_mod, cls_name)
        saved = cls.__call__
        cls.__call__ = fn
        try:
            yield
        finally:
            cls.__call__ = saved

    variants = {
        "full": (None, None),
        "no_attn": ("WindowedAttention", identity_all),
        "no_win_attn": ("WindowedAttention", identity_windowed),
        "no_glob_attn": ("WindowedAttention", identity_global),
        "no_mlp": ("Mlp", identity_all),
    }
    times = {}
    for name, (cls_name, fn) in variants.items():
        with patched(cls_name, fn):
            model = ViTDense(SAM_VIT_B, policy=FAST, trainable=True)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

            def loss(p, v):
                return jnp.sum(model.apply(p, v).astype(jnp.float32) ** 2)

            vg = jax.jit(jax.value_and_grad(loss))
            times[name] = time_model_fn(
                lambda p, v: vg(p, v)[0], params, x, reps=10)
        print(f"{name:14s} {times[name] * 1e3:8.2f} ms "
              f"({batch / times[name]:7.1f} img/s)", flush=True)

    full = times["full"]
    print(
        f"\nimplied fwd+bwd in-context (batch {batch}):\n"
        f"  attention total    {(full - times['no_attn']) * 1e3:7.2f} ms\n"
        f"  windowed layers    "
        f"{(full - times['no_win_attn']) * 1e3:7.2f} ms (8 layers)\n"
        f"  global layers      "
        f"{(full - times['no_glob_attn']) * 1e3:7.2f} ms (4 layers)\n"
        f"  mlp total          {(full - times['no_mlp']) * 1e3:7.2f} ms\n"
        f"  residue            "
        f"{(times['no_attn'] + times['no_mlp'] - full) * 1e3:7.2f} ms"
    )


def time_model_fn(fn, params, x, reps=12):
    """time_model for an arbitrary (params, x) -> scalar-bearing fn."""
    from vit_deep_radiomics_tpu.utils.profiling import device_sync

    out = fn(params, x)
    device_sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(params, x)
        device_sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def components_main(batch: int) -> None:
    """Identity-ablation profile of the full SAM ViT-B/16 forward.

    Each variant re-inits its own params (identity modules declare no
    params), so timings share nothing but the compile cache.  reps=36
    keeps the residual amortised dispatch constant ~0.65 ms/call; the
    reported per-component numbers are full-minus-ablated differences,
    where that constant cancels entirely.
    """
    import contextlib
    import os

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.mesh import (
        enable_persistent_compile_cache,
    )
    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models import vit as vit_mod
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    enable_persistent_compile_cache()
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(batch, 1024, 1024, 3))
        .astype(np.float32)
    )

    def identity_call(self, y=None, *a, **k):
        return y

    @contextlib.contextmanager
    def patched(cls_name, env=None):
        saved_env = {}
        if env:
            for key, val in env.items():
                saved_env[key] = os.environ.get(key)
                os.environ[key] = val
        saved = None
        if cls_name is not None:
            cls = getattr(vit_mod, cls_name)
            saved = cls.__call__
            cls.__call__ = identity_call
        try:
            yield
        finally:
            if saved is not None:
                getattr(vit_mod, cls_name).__call__ = saved
            for key, val in saved_env.items():
                if val is None:
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = val

    # LayerNorm identity must still return (scale, bias) for the fused
    # MLP's param-only call, so ablate LN with the fused kernel OFF.
    variants = {
        "full": (None, {}),
        "no_attn": ("WindowedAttention", {}),
        "no_mlp": ("Mlp", {"VDR_FUSED_MLP": "0"}),
        "unfused_mlp": (None, {"VDR_FUSED_MLP": "0"}),
        "no_mlp_no_ln": ("Mlp", {"VDR_FUSED_MLP": "0"}),  # + LN patch
        "maxed": (None, {"VDR_FLASH_NOMAX": "0"}),
    }
    times = {}
    for name, (cls_name, env) in variants.items():
        ctx = patched(cls_name, env)
        with ctx:
            if name == "no_mlp_no_ln":
                with patched("LayerNorm"):
                    model = ViTDense(SAM_VIT_B, policy=FAST)
                    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
                    times[name] = time_model(model, params, x, reps=36)
            else:
                model = ViTDense(SAM_VIT_B, policy=FAST)
                params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
                times[name] = time_model(model, params, x, reps=36)
        print(f"{name:14s} {times[name] * 1e3:8.2f} ms "
              f"({batch / times[name]:7.1f} img/s)", flush=True)

    full = times["full"]
    print(
        f"\nimplied in-context (batch {batch}):\n"
        f"  attention total   {(full - times['no_attn']) * 1e3:7.2f} ms\n"
        f"  mlp total (fused) {(full - times['no_mlp']) * 1e3:7.2f} ms"
        f"  [vs unfused Δ {(times['unfused_mlp'] - full) * 1e3:+.2f} ms]\n"
        f"  layernorm (norm1+norm2 unfused) "
        f"{(times['no_mlp'] - times['no_mlp_no_ln']) * 1e3:7.2f} ms\n"
        f"  nomax saving      {(times['maxed'] - full) * 1e3:7.2f} ms\n"
        f"  residue (patch+neck+rel-pos+glue) "
        f"{(times['no_attn'] + times['no_mlp'] - full) * 1e3:7.2f} ms "
        f"(≈ no_attn + no_mlp - full)"
    )


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
    if len(sys.argv) > 1 and sys.argv[1] == "components":
        components_main(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "traincomponents":
        train_components_main(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    else:
        main()
