"""Serving warm-start measurement: executable-cache miss vs hit, with
the warm() phase split (VERDICT r4 item 6).

Builds a random-init SAM-B raw-HU fused pipeline artifact (the same
config as artifacts/pipeline_serve_warmstart_r4.json), then runs
``serve run`` in three fresh subprocesses against a fresh
VDR_EXEC_CACHE:

1. **cold_miss** — no cached executable: pays remote compile + first
   execution; saves the binary.
2. **hit** — loads the cached executable; ``warm()`` now reports the
   split the round-4 verdict asked for: disk read/unpickle vs
   executable deserialize vs first-execution program/weights upload,
   plus ``exec_bytes`` → implied upload MB/s and a raw 64 MiB H2D
   probe (``h2d_probe_mbps``) to bound the avoidable share.
3. **hit2** — repeat for spread.

Writes ``artifacts/pipeline_serve_warmstart_r5.json``.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    items = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    work = Path(tempfile.mkdtemp(prefix="warmstart_r5_"))
    cache = work / "exec_cache"

    # 1. random-init classifier checkpoint at the real feature_dim
    from flax import serialization

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.core.precision import get_policy
    from vit_deep_radiomics_tpu.models.classifiers import build_classifier
    from vit_deep_radiomics_tpu.utils.config import load_conf

    cfg = load_conf()
    clf = build_classifier(cfg, "transformer", "ct",
                           policy=get_policy("fast"))
    d = int(cfg["models"]["transformer"]["feature_dim"])
    pv = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, d)),
                  jnp.ones((1, 8), bool))
    ckpt = work / "model_epoch_0000.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"params": jax.device_get(pv)}))

    # 2. export the raw-HU fused pipeline artifact (bf16-baked weights)
    art = work / "pipe_r5.vdr"
    run = subprocess.run(
        [sys.executable, "-m", "vit_deep_radiomics_tpu", "serve",
         "export-pipeline", str(ckpt), "-o", str(art), "-m", "ct",
         "--slices", "13", "--batch", "1", "--input-mode", "raw-hu",
         "--native-size", "512"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    if run.returncode != 0:
        sys.exit(f"export failed:\n{run.stdout[-2000:]}\n"
                 f"{run.stderr[-4000:]}")
    meta = json.loads(subprocess.run(
        [sys.executable, "-m", "vit_deep_radiomics_tpu", "serve", "info",
         str(art)], cwd=REPO, capture_output=True, text=True,
        timeout=600).stdout)

    # 3. inputs per in_spec (int16 HU CT volumes + spatial res)
    rng = np.random.default_rng(0)
    arrays = {}
    for name, (shape, dtype) in meta["in_spec"].items():
        shape = [items if i == 0 else int(v)
                 for i, v in enumerate(shape)]
        if "mask" in name:
            continue                      # all-valid assumed
        if np.dtype(dtype) == np.int16:
            arrays[name] = rng.integers(
                -1000, 400, size=shape).astype(np.int16)
        elif "res" in name:
            arrays[name] = np.full(shape, 0.8, np.float32)
        else:
            arrays[name] = rng.uniform(size=shape).astype(dtype)
    inp = work / "volumes.npz"
    np.savez(inp, **arrays)

    # 4. three fresh-process serve runs against the same cache
    rounds = {}
    for tag in ("cold_miss", "hit", "hit2"):
        out = work / f"out_{tag}.npz"
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "vit_deep_radiomics_tpu", "serve",
             "run", str(art), "-i", str(inp), "-o", str(out)],
            cwd=REPO, capture_output=True, text=True, timeout=3600,
            env=dict(os.environ, VDR_EXEC_CACHE=str(cache),
                     VDR_WARM_PROBE="1"))
        wall = round(time.time() - t0, 2)
        line = {}
        for ln in r.stdout.splitlines()[::-1]:
            try:
                line = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
        warm_line = {}
        for ln in r.stderr.splitlines():
            try:
                cand = json.loads(ln)
                if "warm_s" in cand:
                    warm_line = cand
            except json.JSONDecodeError:
                continue
        rounds[tag] = {"process_wall_s": wall, **warm_line, **line}
        if r.returncode != 0:
            rounds[tag]["error"] = r.stderr[-2000:]
        print(tag, json.dumps(rounds[tag])[:400], flush=True)

    artifact = {
        "what": ("serving warm-start phase attribution (VERDICT r4 "
                 "item 6): SAM-B raw-HU fused pipeline, random-init "
                 "weights, batch 1, 13-slice 512^2 int16 volumes, "
                 f"{items} items; warm() split = read/unpickle vs "
                 "executable deserialize vs first-exec program+weights "
                 "upload; h2d_probe_mbps bounds the link rate"),
        "artifact_bytes": art.stat().st_size,
        "rounds": rounds,
    }
    out_path = REPO / "artifacts" / "pipeline_serve_warmstart_r5.json"
    out_path.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
