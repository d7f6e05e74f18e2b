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


def _sync(out):
    """Tunnel-honest execution fence (scalar pull). See
    vit_deep_radiomics_tpu.utils.profiling.device_sync for the measured
    evidence on why block_until_ready cannot be used here."""
    from vit_deep_radiomics_tpu.utils.profiling import device_sync

    device_sync(out)


def _enable_cache():
    from vit_deep_radiomics_tpu.core.mesh import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

BASELINE_CACHE = REPO / "bench_baseline.json"
BATCH = 4
# Deep queue: the axon tunnel's per-call dispatch overhead is ~2 ms at
# shallow queue depths and ~0.65 ms amortised at depth ≳60 — the
# production extraction pipeline enqueues continuously, so the deep-
# queue number is the honest steady-state figure (docs/ROADMAP.md).
STEPS = 36
# TPU v5e (v5 lite) nominal bf16 peak per chip, for the MFU readout.
PEAK_BF16_TFLOPS = 197.0


def sam_vitb_flops_per_image() -> float:
    """Analytic useful-math FLOPs of one SAM ViT-B/16 @1024 forward
    (2·m·n·k per matmul; attention counts the real 196-token windows,
    not their padded tiles)."""
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B as cfg

    s = cfg.grid * cfg.grid                      # 4096 tokens
    c = cfg.width                                # 768
    h = cfg.num_heads
    d = cfg.head_dim
    mlp = int(cfg.mlp_ratio * c)
    win = cfg.window_size                        # 14
    n_win = (-(-cfg.grid // win)) ** 2           # 5x5 padded windows
    wt = win * win                               # 196 tokens per window

    patch = 2 * s * (cfg.patch_size ** 2 * 3) * c
    per_block = 2 * s * c * 3 * c + 2 * s * c * c + 2 * (2 * s * c * mlp)
    attn_global = 2 * (2 * h * s * s * d)        # scores + AV
    attn_window = 2 * (2 * h * n_win * wt * wt * d)
    n_global = len(cfg.global_indexes)
    n_windowed = cfg.depth - n_global
    neck = 2 * s * c * cfg.neck_channels + 2 * s * cfg.neck_channels ** 2 * 9
    return float(
        patch + cfg.depth * per_block
        + n_global * attn_global + n_windowed * attn_window + neck
    )


def vitl14_flops_per_image(image_size: int = 518) -> float:
    """Analytic useful-math FLOPs of one DINOv2 ViT-L/14 dense forward
    (real 1370 tokens incl. CLS, not the padded 1536 tile)."""
    from vit_deep_radiomics_tpu.models.vit import DINOV2_CONFIGS

    cfg = DINOV2_CONFIGS["dinov2_vitl14"]
    grid = image_size // cfg.patch_size
    s = grid * grid + 1                          # patch tokens + CLS
    c = cfg.width
    h, d = cfg.num_heads, cfg.head_dim
    mlp = int(cfg.mlp_ratio * c)
    patch = 2 * (grid * grid) * (cfg.patch_size ** 2 * 3) * c
    per_block = 2 * s * c * 3 * c + 2 * s * c * c + 2 * (2 * s * c * mlp)
    attn = 2 * (2 * h * s * s * d)               # scores + AV
    return float(patch + cfg.depth * (per_block + attn))


def measure_vitl14_dense() -> dict:
    """Secondary config (BASELINE.json config 3): DINOv2-style ViT-L/14
    full dense tokens @518, bf16 batched inference — best-of-6 passes
    with the spread recorded.  Run via ``python bench.py vitl14``."""
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
    passes = _throughput_passes(apply, params, images, n_passes=6)
    return {
        "value": max(passes),
        "passes": [round(p, 2) for p in passes],
        "spread": [round(min(passes), 2), round(max(passes), 2)],
    }


def _wait_for_backend() -> None:
    """Wait out a tunneled-TPU outage instead of failing the bench.

    The axon tunnel goes UNAVAILABLE in ~25-minute cycles after a
    pathological compile elsewhere kills its claim; ``jax.devices()``
    then raises after the PJRT client's own internal retries.  A bench
    run landing mid-outage should be patient — it is the round's
    recorded artifact.  Bounded by ``VDR_BENCH_PATIENCE`` seconds
    (default 14400 — multi-hour outages have been observed when prior
    clients were killed mid-claim, incl. one >11 h with a thundering
    herd of stale retrying clients; each failed client init takes
    ~25 min to raise); healthy backends return on the first attempt.
    """
    import os

    import jax

    deadline = time.monotonic() + float(
        os.environ.get("VDR_BENCH_PATIENCE", "14400"))
    while True:
        try:
            jax.devices()
            return
        except RuntimeError as exc:
            if time.monotonic() >= deadline:
                raise
            print(f"# backend unavailable, retrying in 60s: {exc}",
                  file=sys.stderr)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
            time.sleep(60)


def _throughput_passes(apply, params, images, n_passes: int = 3,
                       batch: int | None = None) -> list[float]:
    """Deep-queue throughput passes → img/s per pass (first = warmup'd).

    Shared by the default/vitl14/int8 modes.  Each pass enqueues STEPS
    dispatches and fences once via the scalar pull (`_sync`); callers
    take the best pass and SHOULD record the spread — the round-4
    driver artifact (108.96 img/s) sat 3 % under the same session's
    in-context A/Bs (112.5 ×2) because a single unreported pass has no
    defense against tunnel mood (VERDICT r4 weak #3)."""
    batch = BATCH if batch is None else batch
    _sync(apply(params, images))          # warmup / compile
    passes = []
    for _rep in range(n_passes):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = apply(params, images)
        _sync(out)
        passes.append(batch / ((time.perf_counter() - t0) / STEPS))
    return passes


def measure_tpu(policy_name: str = "fast", n_passes: int = 3,
                detail: bool = False):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import get_policy
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    use_flash = jax.default_backend() == "tpu"
    model = ViTDense(SAM_VIT_B, policy=get_policy(policy_name),
                     use_flash=use_flash)
    images = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(BATCH, 1024, 1024, 3))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    apply = jax.jit(model.apply)

    passes = _throughput_passes(apply, params, images, n_passes)
    if detail:
        return {
            "value": max(passes),
            "passes": [round(p, 2) for p in passes],
            "spread": [round(min(passes), 2), round(max(passes), 2)],
        }
    return max(passes)


def _interleaved_env_ab(env_key: str, variants) -> dict:
    """Shared core of the single-process env-knob A/Bs (nomax, mlpfuse).

    Traces one executable per (name, flag) under its env value — the
    knobs are read at TRACE time — then times them with alternating
    order so tunnel mood cancels (between-run variance through this
    tunnel is ±15%, which would swamp a few-percent delta).  Returns
    best img/s per variant name.
    """
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    if jax.default_backend() != "tpu":
        # off-TPU the model builds with use_flash=False: neither variant
        # would contain the kernels and the "A/B" would record noise —
        # the same mislabeling class the int8 export guards reject
        raise RuntimeError(
            f"bench {env_key} A/B needs the TPU flash path; default "
            f"backend is {jax.default_backend()!r}")
    model = ViTDense(SAM_VIT_B, policy=FAST, use_flash=True)
    images = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(BATCH, 1024, 1024, 3))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    # Restore the caller's value even on a mid-trace failure — under
    # `bench.py all` a leaked flag would contaminate every later mode.
    applies = {}
    saved = os.environ.get(env_key)
    try:
        for name, flag in variants:
            os.environ[env_key] = flag
            fn = jax.jit(lambda p, x: model.apply(p, x))
            _sync(fn(params, images))          # trace + warm
            applies[name] = fn
    finally:
        if saved is None:
            os.environ.pop(env_key, None)
        else:
            os.environ[env_key] = saved

    names = [name for name, _ in variants]
    best = {name: float("inf") for name in names}
    for rep in range(4):
        order = names if rep % 2 == 0 else names[::-1]
        for name in order:
            fn = applies[name]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = fn(params, images)
            _sync(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / STEPS)
    return {
        "model": model, "params": params, "images": images,
        "img_per_s": {name: BATCH / dt for name, dt in best.items()},
    }


def measure_fused_mlp_ab() -> dict:
    """Interleaved A/B of the fused LN→MLP→residual Pallas kernel
    (VDR_FUSED_MLP — ops/mlp_fused.py) against the plain XLA module
    path.  Added when the round-3 components ablation read the fused
    path ~0.9 ms SLOWER than XLA post-nomax — the round-2 +1 img/s win
    needed re-deciding under the interleaved discipline."""
    r = _interleaved_env_ab(
        "VDR_FUSED_MLP", (("fused", "1"), ("unfused", "0")))
    return r["img_per_s"]


def measure_score_dtype_ab() -> dict:
    """Interleaved A/B of the bf16 score pipeline (the default in the
    fused flash kernels) vs fp32 scores (VDR_FLASH_SCORE_F32=1) — the
    round-3 verdict's "lower-precision exp" experiment, inverted: the
    nomax path already runs its exp2/accumulate chain in bf16, so the
    measurable question is what that bf16 chain is WORTH and what
    fidelity it costs."""
    import numpy as np

    r = _interleaved_env_ab(
        "VDR_FLASH_SCORE_F32", (("bf16_scores", "0"), ("f32_scores", "1")))
    model, params, images = r["model"], r["params"], r["images"]
    result = dict(r["img_per_s"])

    # fidelity: bf16-score features vs the fp32-score variant (both
    # bf16 weights/activations — isolates the score-chain precision)
    import os

    import jax

    saved = os.environ.get("VDR_FLASH_SCORE_F32")
    try:
        # fresh lambdas: `jax.jit(model.apply)` twice shares the pjit
        # cache for the same bound method, so the second call would
        # reuse the FIRST trace and never re-read the env knob (the
        # first run of this check measured an artifact 0.0 diff that
        # a kernel-level probe disproved — max |Δ| 0.031 at random
        # bias).  A distinct lambda forces a distinct trace.
        os.environ["VDR_FLASH_SCORE_F32"] = "0"
        a = np.asarray(jax.jit(lambda p, x: model.apply(p, x))(
            params, images), dtype=np.float32)
        os.environ["VDR_FLASH_SCORE_F32"] = "1"
        b = np.asarray(jax.jit(lambda p, x: model.apply(p, x))(
            params, images), dtype=np.float32)
    finally:
        if saved is None:
            os.environ.pop("VDR_FLASH_SCORE_F32", None)
        else:
            os.environ["VDR_FLASH_SCORE_F32"] = saved
    result["max_abs_feature_diff"] = float(np.max(np.abs(a - b)))
    denom = np.linalg.norm(a.reshape(a.shape[0], -1), axis=1)
    num = np.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
    result["rel_l2_feature_diff"] = float(np.max(num / denom))
    return result


def measure_nomax_ab() -> dict:
    """In-process alternating A/B of the nomax flash softmax
    (VDR_FLASH_NOMAX — ops/attention.py) against the default kernels.

    Both variants compile in ONE process over the same params/images and
    the timing reps interleave with alternating order, so tunnel mood
    cancels (see _interleaved_env_ab).
    """
    import numpy as np

    import jax

    r = _interleaved_env_ab(
        "VDR_FLASH_NOMAX", (("base", "0"), ("nomax", "1")))
    model, params, images = r["model"], r["params"], r["images"]
    result = dict(r["img_per_s"])

    # Measure the nomax precondition, don't just assert it in prose:
    # max |scaled logit| (rel-pos bias included, fp32 oracle path) on
    # one benchmarked image vs the exp2 overflow bound 127/log2(e).
    # Runs on the host CPU backend — the probe is a debug graph, and
    # the quantity is data+param math independent of the device.
    from vit_deep_radiomics_tpu.models.vit import probe_max_abs_logit

    with jax.default_device(jax.devices("cpu")[0]):
        result["max_abs_logit"] = probe_max_abs_logit(
            model, jax.device_get(params), jax.device_get(images[:1]))
    result["logit_bound"] = 127 / float(np.log2(np.e))
    return result


def measure_batch_sweep(
    candidates=(2, 4, 8, 16),
    reps: int = 3,
) -> dict:
    """On-chip image-batch sweep of the flagship SAM-B dense forward.

    The bench's steady-state BATCH=4 was never swept: larger batches
    amortise per-dispatch overhead and the fixed LN/reshape glue
    between matmuls, at the cost of HBM working set.  One process, one
    shared param set, per-candidate images + executables, rotating
    interleaved timing (tunnel variance cancels); throughput is img/s
    so points are directly comparable.  OOM candidates are recorded,
    not fatal.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    if jax.default_backend() != "tpu":
        raise RuntimeError(
            "bench batchsweep measures the TPU dense path; default "
            f"backend is {jax.default_backend()!r}")
    model = ViTDense(SAM_VIT_B, policy=FAST, use_flash=True)
    rng = np.random.default_rng(0)
    init_x = jnp.asarray(
        rng.uniform(size=(1, 1024, 1024, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)

    cases = {}
    failed = {}
    for b in candidates:
        x = jnp.asarray(
            rng.uniform(size=(b, 1024, 1024, 3)).astype(np.float32))
        fn = jax.jit(lambda p, im: model.apply(p, im))
        try:
            _sync(fn(params, x))              # trace + warm
        except Exception as e:                      # noqa: BLE001
            msg = str(e)
            failed[b] = ("oom" if "memory" in msg.lower()
                         else msg.splitlines()[0][:120])
            print(f"# batch={b}: {failed[b]}", file=sys.stderr)
            continue
        cases[b] = (fn, x)
    if not cases:
        raise RuntimeError(f"every batch candidate failed: {failed}")

    best = {b: float("inf") for b in cases}
    order = list(cases)
    for rep in range(reps):
        rot = order[rep % len(order):] + order[: rep % len(order)]
        for b in rot:
            fn, x = cases[b]
            steps = max(6, STEPS * BATCH // b)   # ~equal images/round
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(params, x)
            _sync(out)
            best[b] = min(best[b], (time.perf_counter() - t0) / steps)
    curve = {b: round(b / dt, 3) for b, dt in best.items()}
    top = max(curve, key=curve.get)
    return {"curve": curve, "best_batch": top,
            "best_img_per_s": curve[top], "failed": failed}


def measure_window_sweep(
    candidates=(1, 2, 4, 10, 25, 50),
    reps: int = 3,
) -> dict:
    """On-chip VDR_WINDOW_BATCH sweep (grouped window flash kernel).

    The SAM-B windowed layers dispatch one grid step per window row
    batch; ``window_batch`` batches rows on the leading block dim to
    amortise per-step dispatch + one-hot bias builds
    (ops/attention.py:514-521).  The knob is read at trace time
    (models/vit.py:480), so each candidate traces its own executable in
    ONE process over shared params/images; timing reps interleave with
    rotating order so tunnel mood cancels (same discipline as
    measure_nomax_ab).  Candidates must divide the window-row count
    (BATCH·25 for SAM-B@1024) — the model auto-halves otherwise, which
    would silently duplicate a measured point.
    """
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    if jax.default_backend() != "tpu":
        raise RuntimeError(
            "bench windowsweep needs the TPU flash window kernel; "
            f"default backend is {jax.default_backend()!r}")
    model = ViTDense(SAM_VIT_B, policy=FAST, use_flash=True)
    images = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(BATCH, 1024, 1024, 3))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    applies = {}
    failed = {}
    saved = os.environ.get("VDR_WINDOW_BATCH")
    try:
        for g in candidates:
            os.environ["VDR_WINDOW_BATCH"] = str(g)
            fn = jax.jit(lambda p, x: model.apply(p, x))
            try:
                _sync(fn(params, images))      # trace + warm
            except Exception as e:                   # noqa: BLE001
                # big row batches blow the 64 MB scoped-VMEM stack of
                # the fused-QKV kernel (measured: g=25 at batch 4 needs
                # 81.5 MB) — record the infeasible point, keep sweeping
                msg = str(e)
                failed[g] = ("vmem_oom" if "vmem" in msg.lower()
                             else msg.splitlines()[0][:120])
                print(f"# window_batch={g}: {failed[g]}",
                      file=sys.stderr)
                continue
            applies[g] = fn
    finally:
        if saved is None:
            os.environ.pop("VDR_WINDOW_BATCH", None)
        else:
            os.environ["VDR_WINDOW_BATCH"] = saved
    if not applies:
        raise RuntimeError(f"every window_batch candidate failed: {failed}")

    best = {g: float("inf") for g in applies}
    order = list(applies)
    for rep in range(reps):
        rot = order[rep % len(order):] + order[: rep % len(order)]
        for g in rot:
            fn = applies[g]
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = fn(params, images)
            _sync(out)
            best[g] = min(best[g], (time.perf_counter() - t0) / STEPS)
    curve = {g: round(BATCH / dt, 3) for g, dt in best.items()}
    top = max(curve, key=curve.get)
    return {"curve": curve, "best_g": top, "best_img_per_s": curve[top],
            "failed": failed}


def measure_finetune(
    configs=((4, False, {}), (4, False, {"VDR_FGT_NOMAX": "1"}),
             (4, "mlp", {}), (4, "mlp", {"VDR_FGT_NOMAX": "1"}),
             (2, False, {}), (8, False, {}), (8, "mlp", {}),
             (16, "mlp", {}), (16, False, {}), (4, True, {})),
    steps: int = 6,
) -> dict:
    """Trainable-backbone training throughput curve (batch × remat ×
    trace-time env).

    Full SAM-B fine-tuning step (fwd + bwd + AdamW update via
    engine/finetune.py) per config; training MFU counts the standard
    3× forward model FLOPs (remat recomputes a 4th forward but that is
    overhead, not model work).  remat ∈ {False, 'mlp', True}: 'mlp' is
    the selective policy (recompute only the MLP hidden activations —
    models/vit.py), True recomputes whole blocks.  The env column
    carries TRACE-time knobs; the nomax pairs sit adjacent in the
    sweep so tunnel mood largely cancels, and each config's timed loop
    is run twice (best-of-2).  B=16 exercises the 512² block
    auto-degrade (VERDICT r4 item 5) — if the backend still refuses,
    the exact compiler error lands in the curve row.  Beyond-reference
    capability — the reference freezes its backbone
    (/root/reference/src/tfds_dense_descriptor.py:104).
    """
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.engine.finetune import (
        FineTuneConfig,
        FineTuner,
    )

    flops_fwd = sam_vitb_flops_per_image()
    rng = np.random.default_rng(0)
    curve = []
    for batch, remat, env in configs:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            tuner = FineTuner(FineTuneConfig(
                backbone="medsam", precision="fast", remat=remat))
            g = tuner.backbone_cfg.grid
            images = jnp.asarray(
                rng.uniform(size=(batch, 1024, 1024, 3))
                .astype(np.float32))
            mask = jnp.ones((batch, g, g), bool)
            labels = jnp.asarray(
                np.eye(2, dtype=np.float32)[np.arange(batch) % 2])
            try:
                state = tuner.init(jax.random.PRNGKey(0), images, mask)
                state, loss, _ = tuner.step(state, images, mask, labels)
                float(loss)                              # warm + compile
                dt = float("inf")
                for _rep in range(2):                    # best-of-2
                    t0 = time.perf_counter()
                    for _ in range(steps):
                        state, loss, _ = tuner.step(
                            state, images, mask, labels)
                    float(loss)
                    dt = min(dt, (time.perf_counter() - t0) / steps)
            except Exception as exc:  # noqa: BLE001 — record honestly
                curve.append({"batch": batch, "remat": remat,
                              "env": env, "error": repr(exc)[:400]})
                continue
            img_s = batch / dt
            curve.append({
                "batch": batch, "remat": remat, "env": env,
                "img_per_s": round(img_s, 2),
                "step_ms": round(dt * 1e3, 1),
                "train_mfu": round(
                    img_s * 3 * flops_fwd / 1e12 / PEAK_BF16_TFLOPS, 4),
            })
            del state
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    ok = [c for c in curve if "img_per_s" in c]
    best = max(ok, key=lambda c: c["img_per_s"]) if ok else {}
    # nomax verdict: same (batch, remat) rows with/without the knob
    nomax_ab = {}
    for c in ok:
        if c["env"].get("VDR_FGT_NOMAX") == "1":
            base = next(
                (b for b in ok if b["batch"] == c["batch"]
                 and b["remat"] == c["remat"] and not b["env"]), None)
            if base:
                key = f"b{c['batch']}_{c['remat'] or 'noremat'}"
                nomax_ab[key] = {
                    "base_img_per_s": base["img_per_s"],
                    "nomax_img_per_s": c["img_per_s"],
                    "speedup": round(
                        c["img_per_s"] / base["img_per_s"], 4),
                }
    return {"curve": curve, "best": best, "nomax_ab": nomax_ab}


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


def _flagship_clf_cfg(fold_map, epochs: int) -> dict:
    """The flagship downstream-transformer config (the
    conf/parameters_models.yaml schema) shared by the e2e and foldpar
    benches — one literal so the two benches cannot drift apart."""
    return {
        "models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": 256,
                "batch_size": 8, "virtual_batch_size": 32,
                "num_epochs": epochs, "patience": 15,
                "ct": {"num_layers": 2, "num_heads": 4, "mlp_ratio": 4},
                "pet": {"num_layers": 2, "num_heads": 4, "mlp_ratio": 4},
            },
        },
        "kfold_patients": fold_map,
    }


def measure_e2e(n_patients: int = 6) -> dict:
    """End-to-end pipeline bench, reproducible from the harness
    (VERDICT r1 #9): synthetic isotropic cohort → FULL extraction sweep
    (flagship SAM ViT-B @1024, 12 offline augmentations, work queue,
    prefetch, deferred writes, host I/O included) → merge → split →
    1-fold downstream training; reports e2e img/s and s/epoch."""
    import tempfile

    import jax

    from vit_deep_radiomics_tpu.data import feature_store, splits, synthetic
    from vit_deep_radiomics_tpu.engine.extract import (
        DenseExtractor,
        ExtractionConfig,
        extract_isotropic_dataset,
    )
    from vit_deep_radiomics_tpu.engine.train import (
        TrainerConfig,
        train_kfold,
    )

    use_flash = jax.default_backend() == "tpu"
    ct_slices, pet_slices = 8, 4
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        cohort = synthetic.synthetic_cohort(
            n_patients=n_patients, seed=0, dataset="stanford",
            height=96, width=96, ct_slices=ct_slices,
            pet_slices=pet_slices,
        )
        synthetic.write_isotropic_hdf5(
            cohort, tmp / "iso.hdf5", tmp / "iso.csv")
        ex = DenseExtractor(ExtractionConfig(
            model_name="medsam", precision="fast", use_flash=use_flash,
        ))
        # per-stage wall attribution (engine/extract.py::StageTimes) +
        # a forward counter so device busy time can be estimated from a
        # warm forward timing after the sweep
        from vit_deep_radiomics_tpu.engine.extract import StageTimes

        ex.stats = StageTimes()
        n_fwd = [0]
        inner_apply = ex._apply

        def counting_apply(p, x):
            n_fwd[0] += 1
            return inner_apply(p, x)

        ex._apply = counting_apply
        t0 = time.perf_counter()
        written = extract_isotropic_dataset(
            tmp / "iso.hdf5", tmp / "iso.csv", tmp / "features", ex,
            modalities=("pet", "ct"), datasets=("stanford",),
        )
        extract_s = time.perf_counter() - t0
        n_augs = len(ex.config.flips) * len(ex.config.angles)
        n_images = n_patients * (ct_slices + pet_slices) * n_augs
        assert len(written) == 2 * n_patients
        # warm per-forward time at the sweep's batch (D2H sum forces the
        # tunnel sync; block_until_ready is unreliable here)
        import jax.numpy as jnp
        import numpy as _np

        dummy = jnp.asarray(_np.random.default_rng(1).uniform(
            size=(ex.config.slice_batch, ex.image_size, ex.image_size, 3)
        ).astype(_np.float32))
        _sync(inner_apply(ex.params, dummy))
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = inner_apply(ex.params, dummy)
        _sync(out)
        fwd_s = (time.perf_counter() - t0) / reps
        device_busy_s = n_fwd[0] * fwd_s
        stage_s = {k: round(v, 2) for k, v in ex.stats.items()
                   if not k.startswith("_")}

        df = feature_store.merge_metadata(
            tmp / "features", datasets=("stanford_dataset",))
        folds = splits.build_kfold_patients(df, n_splits=2)
        cfg = _flagship_clf_cfg(folds, epochs=3)
        tcfg = TrainerConfig(
            arch="transformer", modality="petct", loss="crossmodal",
            dataset="stanford", batch_size=8, precision="fast",
            max_epochs=3,
        )
        t0 = time.perf_counter()
        train_kfold(
            df, cfg, tcfg,
            tmp / "features/features_masks_ct.hdf5",
            tmp / "features/features_masks_pet.hdf5",
            tmp / "models", folds=[0], log=lambda *_: None,
        )
        train_s = time.perf_counter() - t0
    return {
        "extract_img_per_s_e2e": round(n_images / extract_s, 3),
        "extract_s": round(extract_s, 2),
        "n_images": n_images,
        "train_s_per_epoch": round(train_s / 3, 2),
        # per-stage host wall shares (threads overlap — see StageTimes)
        "stage_s": stage_s,
        # device compute estimate: counted ViT forwards × warm
        # per-forward time measured after the sweep on the same claim
        "device_busy_s_est": round(device_busy_s, 2),
        "device_idle_frac_est": round(
            max(0.0, 1.0 - device_busy_s / extract_s), 3),
        "n_forwards": n_fwd[0],
        "fwd_s_warm": round(fwd_s, 4),
    }


def measure_wire_ab(h: int = 512, w: int = 512, s: int = 12,
                    reps: int = 4) -> dict:
    """Extraction-feed wire-dtype A/B: f32 vs int16 raw-HU upload.

    One real-scale CT volume (default 512²×12 — native CT resolution),
    full 12-augmentation extract_volume, interleaved reps.  The int16
    wire halves H2D bytes (the window/normalise already runs in-graph
    either way — ExtractionConfig.wire_dtype); also reports the feature
    fidelity delta from rounding fractional resampled HU to integers.
    """
    import numpy as np

    import jax

    from vit_deep_radiomics_tpu.engine.extract import (
        DenseExtractor,
        ExtractionConfig,
    )

    rng = np.random.default_rng(0)
    vol = rng.uniform(-1000, 1500, size=(h, w, s)).astype(np.float32)
    mask = np.zeros((h, w, s), bool)
    mask[h // 2 - 40:h // 2 + 40, w // 2 - 30:w // 2 + 30, :] = True

    ex = DenseExtractor(ExtractionConfig(
        model_name="medsam", precision="fast",
        use_flash=jax.default_backend() == "tpu",
    ))

    def run():
        feats, _, _ = ex.extract_volume(vol, mask, "ct")
        return feats

    # fidelity: same crop geometry both ways, so compare flat
    ex.config.wire_dtype = "float32"
    f32_feats = run()
    ex.config.wire_dtype = "int16"
    i16_feats = run()
    diffs = [float(np.max(np.abs(a - b)))
             for a, b in zip(f32_feats, i16_feats)]
    times = {"float32": [], "int16": []}
    for _ in range(reps):
        for wire in ("float32", "int16"):
            ex.config.wire_dtype = wire
            t0 = time.perf_counter()
            run()
            times[wire].append(time.perf_counter() - t0)
    best = {k: min(v) for k, v in times.items()}
    return {
        "volume": [h, w, s],
        "f32_s": round(best["float32"], 3),
        "int16_s": round(best["int16"], 3),
        "speedup_int16": round(best["float32"] / best["int16"], 3),
        "wire_mib_f32": round(h * w * s * 4 / 2 ** 20, 1),
        "wire_mib_int16": round(h * w * s * 2 / 2 ** 20, 1),
        "max_abs_feature_diff": round(max(diffs), 5),
    }


def measure_foldpar(n_patients: int = 8, epochs: int = 3,
                    folds: int = 2) -> dict:
    """Sequential vs fold-parallel k-fold training A/B (same data, same
    flagship classifier config, warm compiles both sides via a shared
    first untimed run per mode).  The descriptors come from a tiny
    backbone — the A/B measures the downstream trainer, whose inputs are
    (tokens, 256) either way."""
    import dataclasses
    import tempfile

    from vit_deep_radiomics_tpu.data import feature_store, splits, synthetic
    from vit_deep_radiomics_tpu.engine.extract import (
        DenseExtractor,
        ExtractionConfig,
        extract_isotropic_dataset,
    )
    from vit_deep_radiomics_tpu.engine.train import (
        TrainerConfig,
        train_kfold,
    )
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        cohort = synthetic.synthetic_cohort(
            n_patients=n_patients, seed=0, dataset="stanford",
            height=96, width=96, ct_slices=8, pet_slices=4,
        )
        synthetic.write_isotropic_hdf5(
            cohort, tmp / "iso.hdf5", tmp / "iso.csv")
        small = dataclasses.replace(
            SAM_VIT_B, image_size=64, width=128, depth=1, num_heads=4,
            window_size=2, global_indexes=(0,), neck_channels=256,
        )
        ex = DenseExtractor(
            ExtractionConfig(
                model_name="medsam", image_size=64, slice_batch=8,
                precision="fast", use_flash=False, volume_bucket=32,
                flips=(None,), angles=(0, 90),
            ),
            backbone_cfg=small,
        )
        extract_isotropic_dataset(
            tmp / "iso.hdf5", tmp / "iso.csv", tmp / "features", ex,
            modalities=("pet", "ct"), datasets=("stanford",),
        )
        df = feature_store.merge_metadata(
            tmp / "features", datasets=("stanford_dataset",))
        fold_map = splits.build_kfold_patients(df, n_splits=folds)
        cfg = _flagship_clf_cfg(fold_map, epochs=epochs)
        timings = {}
        for mode in ("sequential", "fold_parallel"):
            tcfg = TrainerConfig(
                arch="transformer", modality="petct", loss="crossmodal",
                dataset="stanford", batch_size=8, precision="fast",
                max_epochs=epochs,
                fold_parallel=(mode == "fold_parallel"),
            )
            step_cache: dict = {}
            for run in ("warm", "timed"):
                t0 = time.perf_counter()
                train_kfold(
                    df, cfg, tcfg,
                    tmp / "features/features_masks_ct.hdf5",
                    tmp / "features/features_masks_pet.hdf5",
                    tmp / f"models_{mode}_{run}",
                    log=lambda *_: None, step_cache=step_cache,
                )
                timings[f"{mode}_{run}_s"] = round(
                    time.perf_counter() - t0, 2)
    return {
        **timings,
        "folds": folds,
        "epochs": epochs,
        "speedup_warm": round(
            timings["sequential_timed_s"]
            / timings["fold_parallel_timed_s"], 2),
    }


def measure_scaling(cpu: int | None = None, steps: int = 8) -> dict:
    """Data-parallel scaling harness (VERDICT r1 missing #6).

    Times the shard-mapped flagship forward (params replicated, slice
    batch split over the ``data`` axis — exactly `engine.extract`'s
    multi-chip path) over power-of-2 mesh sizes up to every visible
    device, reporting img/s and parallel efficiency per size.  On the
    single-chip tunnel this measures size 1 and exists so real multi-chip
    numbers are one command away (``python bench.py scaling``).  With
    ``--cpu N`` it runs on N virtual CPU devices instead — validating the
    harness and the collective layout end to end; those numbers are
    marked ``"virtual": true`` (virtual devices share one host's cores,
    so absolute throughput and efficiency are NOT hardware-meaningful).
    """
    import numpy as np

    import jax

    if cpu:
        # must precede first backend use; the sitecustomize overrides the
        # JAX_PLATFORMS env var, so go through jax.config (see
        # tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from vit_deep_radiomics_tpu.core.mesh import (
        DATA_AXIS,
        data_sharding,
        make_mesh,
        replicated,
    )
    from vit_deep_radiomics_tpu.core.precision import FAST
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    devs = jax.devices()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg, batch_per = SAM_VIT_B, BATCH
    else:
        import dataclasses

        cfg = dataclasses.replace(
            SAM_VIT_B, image_size=128, width=128, depth=2, num_heads=2,
            window_size=4, global_indexes=(1,), neck_channels=32,
        )
        batch_per = 2
    model = ViTDense(cfg, policy=FAST, use_flash=on_tpu)
    base = np.random.default_rng(0).uniform(
        size=(batch_per, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(base))

    sizes, k = [], 1
    while k <= len(devs):
        sizes.append(k)
        k *= 2
    rows = []
    for k in sizes:
        mesh = make_mesh(devs[:k])
        p_repl = jax.device_put(params, replicated(mesh))
        apply = jax.jit(shard_map(
            model.apply, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
            check_vma=False,
        ))
        images = jax.device_put(
            jnp.asarray(np.tile(base, (k, 1, 1, 1))), data_sharding(mesh, 4)
        )
        _sync(apply(p_repl, images))      # warmup / compile
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = apply(p_repl, images)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        rows.append({"devices": k, "img_per_s": round(k * batch_per / best, 3)})
    per_chip_1 = rows[0]["img_per_s"]
    for r in rows:
        r["efficiency"] = round(
            r["img_per_s"] / (r["devices"] * per_chip_1), 4)
    return {
        "sizes": rows,
        "virtual": not on_tpu,
        "max_devices": len(devs),
        "backend": jax.default_backend(),
    }


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "all":
        # one-command measurement session: every on-chip mode in one
        # process (shared backend claim + compile caches), one JSON line
        # each; a failing mode prints its error and the rest still run.
        # Usage: python bench.py all [mode ...] (default: the full list)
        modes = argv[1:] or ["", "vitl14", "nomax", "e2e", "foldpar",
                             "int8", "int8kernel", "scoredtype", "wire",
                             "finetune", "windowsweep", "batchsweep"]
        for mode in modes:
            print(f"# --- bench {mode or 'default'} ---", file=sys.stderr)
            try:
                main([mode] if mode else [])
            except SystemExit as exc:          # parity subprocess mode
                if exc.code:
                    print(f"# bench {mode or 'default'} exit {exc.code}",
                          file=sys.stderr)
            except Exception as exc:           # noqa: BLE001 — keep going
                print(f"# bench {mode or 'default'} FAILED: {exc!r}",
                      file=sys.stderr)
        return
    if argv and argv[0] == "scaling":
        # configure virtual CPU devices BEFORE any backend initialisation
        import os

        cpu = None
        if len(argv) > 2 and argv[1] == "--cpu":
            cpu = int(argv[2])
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={cpu}"
            )
        _enable_cache()
        if cpu is None:
            # real-device scaling rides out tunnel outages like the
            # other modes (--cpu N uses virtual CPU devices, no wait)
            _wait_for_backend()
        stats = measure_scaling(cpu=cpu)
        top = stats["sizes"][-1]
        print(json.dumps({
            "metric": "dp_scaling_efficiency",
            "value": top["efficiency"],
            "unit": f"parallel_efficiency@{top['devices']}dev",
            "vs_baseline": 0.0,
            **stats,
        }))
        return
    _enable_cache()
    if argv and argv[0] == "e2e":
        _wait_for_backend()
        stats = measure_e2e()
        print(json.dumps({
            "metric": "e2e_extract_throughput",
            "value": stats["extract_img_per_s_e2e"],
            "unit": "img/s",
            "vs_baseline": 0.0,
            **stats,
        }))
        return
    if argv and argv[0] == "wire":
        _wait_for_backend()
        stats = measure_wire_ab()
        print(json.dumps({
            "metric": "extract_feed_wire_int16_speedup",
            "value": stats["speedup_int16"],
            "unit": "x_vs_f32_wire",
            "vs_baseline": 0.0,
            **stats,
        }))
        return
    if argv and argv[0] == "foldpar":
        # optional k override: `bench.py foldpar 5` runs the A/B at the
        # reference's fold count (train_models.py:561) — the round-3
        # retirement was measured at k=2 only (VERDICT r3 item 7)
        _wait_for_backend()
        k = int(argv[1]) if len(argv) > 1 else 2
        stats = measure_foldpar(
            n_patients=max(8, 2 * k), folds=k)
        print(json.dumps({
            "metric": "kfold_train_foldpar_speedup",
            "value": stats["speedup_warm"],
            "unit": "x_vs_sequential_kfold",
            "vs_baseline": stats["speedup_warm"],
            **stats,
        }))
        return
    if argv and argv[0] == "parity":
        import subprocess

        raise SystemExit(subprocess.call([
            sys.executable, str(REPO / "tools" / "auc_parity.py"),
        ] + argv[1:]))
    if argv and argv[0] == "int8":
        # A/B the dynamic-int8 inference policy (ops/quant.py) against
        # the bf16 fast path on the same chip — the MXU's s8 rate is 2×
        # bf16 on v5e, so the projection/MLP share of the backbone is
        # the upside; the attention kernels stay bf16 either way.
        _wait_for_backend()
        fast = measure_tpu("fast")
        q = measure_tpu("int8")
        flops = sam_vitb_flops_per_image()
        print(json.dumps({
            "metric": "sam_vitb16_dense_int8_throughput",
            "value": round(q, 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,  # no reference engine for this config
            "bf16_img_per_s": round(fast, 3),
            "speedup_vs_bf16": round(q / fast, 3),
            "model_tflops_per_img": round(flops / 1e12, 4),
        }))
        return
    if argv and argv[0] == "int8kernel":
        # Pallas s8×s8→s32 kernel rate vs XLA int8 vs bf16 on the five
        # backbone matmul shapes — does the direct Mosaic path expose
        # the v5e 2× s8 MXU rate that XLA's lowering leaves on the
        # table?  (VERDICT r3 item 5)
        _wait_for_backend()
        from vit_deep_radiomics_tpu.ops.quant import int8_pallas_rate_ratio

        shapes = [
            (16384, 768, 768),    # out projection @B4
            (16384, 768, 1536),   # kv projection
            (16384, 768, 3072),   # MLP fc1
            (16384, 3072, 768),   # MLP fc2
            (16384, 768, 256),    # neck 1x1
        ]
        rows = [int8_pallas_rate_ratio(m, k, n) for m, k, n in shapes]
        best = max(r["pallas_vs_bf16"] for r in rows)
        print(json.dumps({
            "metric": "int8_pallas_kernel_vs_bf16",
            "value": best,
            "unit": "x_bf16_rate_best_shape",
            "vs_baseline": 0.0,
            "shapes": rows,
        }))
        return
    if argv and argv[0] == "nomax":
        # interleaved same-process A/B of the unnormalised-exponential
        # flash softmax (drops the running-max VPU work on the score
        # tiles; see ops/attention.py::_fused_global_kernel)
        _wait_for_backend()
        r = measure_nomax_ab()
        flops = sam_vitb_flops_per_image()
        print(json.dumps({
            "metric": "sam_vitb16_dense_nomax_throughput",
            "value": round(r["nomax"], 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,  # no reference engine for this config
            "base_img_per_s": round(r["base"], 3),
            "speedup_vs_base": round(r["nomax"] / r["base"], 4),
            "mfu_nomax": round(
                r["nomax"] * flops / 1e12 / PEAK_BF16_TFLOPS, 4),
            # measured safety margin for the unnormalised-exp softmax:
            # observed max |scaled logit| vs the exp2 overflow bound
            "max_abs_logit": round(r["max_abs_logit"], 3),
            "logit_bound": round(r["logit_bound"], 1),
        }))
        return
    if argv and argv[0] == "scoredtype":
        # bf16 vs fp32 score-chain A/B (VDR_FLASH_SCORE_F32) — turns the
        # "irreducible short of lower-precision exp" roadmap claim into
        # a measured number either way
        _wait_for_backend()
        r = measure_score_dtype_ab()
        flops = sam_vitb_flops_per_image()
        print(json.dumps({
            "metric": "sam_vitb16_dense_score_dtype_ab",
            "value": round(r["bf16_scores"], 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,
            "bf16_img_per_s": round(r["bf16_scores"], 3),
            "f32_img_per_s": round(r["f32_scores"], 3),
            "speedup_bf16_vs_f32": round(
                r["bf16_scores"] / r["f32_scores"], 4),
            "max_abs_feature_diff": round(r["max_abs_feature_diff"], 6),
            "rel_l2_feature_diff": round(r["rel_l2_feature_diff"], 6),
            "mfu_bf16": round(
                r["bf16_scores"] * flops / 1e12 / PEAK_BF16_TFLOPS, 4),
        }))
        return
    if argv and argv[0] == "mlpfuse":
        # interleaved same-process A/B of the fused LN→MLP→residual
        # Pallas kernel vs the plain XLA module path (VDR_FUSED_MLP)
        _wait_for_backend()
        r = measure_fused_mlp_ab()
        flops = sam_vitb_flops_per_image()
        winner = "fused" if r["fused"] >= r["unfused"] else "unfused"
        print(json.dumps({
            "metric": "sam_vitb16_dense_mlpfuse_ab",
            "value": round(max(r.values()), 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,
            "fused_img_per_s": round(r["fused"], 3),
            "unfused_img_per_s": round(r["unfused"], 3),
            "speedup_fused_vs_unfused": round(r["fused"] / r["unfused"], 4),
            "winner": winner,
            "mfu_best": round(
                max(r.values()) * flops / 1e12 / PEAK_BF16_TFLOPS, 4),
        }))
        return
    if argv and argv[0] == "batchsweep":
        _wait_for_backend()
        r = measure_batch_sweep()
        print(json.dumps({
            "metric": "sam_vitb16_dense_batch_sweep",
            "value": r["best_img_per_s"],
            "unit": "img/s/chip",
            "vs_baseline": 0.0,
            "best_batch": r["best_batch"],
            "curve": {str(k): v for k, v in r["curve"].items()},
            "failed": {str(k): v for k, v in r["failed"].items()},
        }))
        return
    if argv and argv[0] == "windowsweep":
        _wait_for_backend()
        r = measure_window_sweep()
        print(json.dumps({
            "metric": "sam_vitb16_window_batch_sweep",
            "value": r["best_img_per_s"],
            "unit": "img/s/chip",
            "vs_baseline": 0.0,
            "best_window_batch": r["best_g"],
            "curve": {str(k): v for k, v in r["curve"].items()},
            "failed": {str(k): v for k, v in r["failed"].items()},
        }))
        return
    if argv and argv[0] == "finetune":
        _wait_for_backend()
        r = measure_finetune()
        best = r["best"]
        print(json.dumps({
            "metric": "sam_vitb16_finetune_throughput",
            "value": best.get("img_per_s", 0.0),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,  # the reference cannot train its backbone
            "train_mfu": best.get("train_mfu"),
            "best_batch": best.get("batch"),
            "best_remat": best.get("remat"),
            "best_env": best.get("env"),
            "nomax_ab": r.get("nomax_ab", {}),
            "curve": r["curve"],
        }))
        return
    if argv and argv[0] == "vitl14":
        _wait_for_backend()
        r = measure_vitl14_dense()
        value = r["value"]
        flops = vitl14_flops_per_image()
        print(json.dumps({
            "metric": "dinov2_vitl14_dense518_throughput",
            "value": round(value, 3),
            "unit": "img/s/chip",
            "vs_baseline": 0.0,  # no reference engine for this config here
            "spread": r["spread"],
            "passes": r["passes"],
            "model_tflops_per_img": round(flops / 1e12, 4),
            "achieved_tflops": round(value * flops / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(
                value * flops / 1e12 / PEAK_BF16_TFLOPS, 4),
        }))
        return
    _wait_for_backend()
    from vit_deep_radiomics_tpu.utils.profiling import memory_summary_gib

    # the round's recorded headline: best of 6 passes with the spread
    # banked alongside, so a moody tunnel shows up as spread instead of
    # silently setting the official number (VERDICT r4 item 3)
    r = measure_tpu(n_passes=6, detail=True)
    value = r["value"]
    baseline = get_baseline()
    flops = sam_vitb_flops_per_image()
    print(json.dumps({
        "metric": "sam_vitb16_dense_descriptor_throughput",
        "value": round(value, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(value / baseline, 2),
        "spread": r["spread"],
        "passes": r["passes"],
        "model_tflops_per_img": round(flops / 1e12, 4),
        "achieved_tflops": round(value * flops / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(
            value * flops / 1e12 / PEAK_BF16_TFLOPS, 4),
        **memory_summary_gib(),
    }))


if __name__ == "__main__":
    main()
