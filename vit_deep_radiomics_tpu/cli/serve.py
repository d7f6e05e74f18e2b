"""CLI: serving-artifact export and batched offline inference.

Completes the deployment story started by ``engine/serve.py``: the
reference has no serving path at all (its encoder only runs inside a
torch + segment_anything Python process,
/root/reference/src/tfds_dense_descriptor.py:87-107).  Here a model
exports once to a self-contained StableHLO ``.vdr`` artifact and any
later process runs it without model-building code::

    # export (weights baked in; random init when --model-path absent)
    python -m vit_deep_radiomics_tpu.cli.serve export \
        --model-name medsam --model-path medsam_vit_b.pth \
        --out models/serving/medsam_b4.vdr --batch 4

    # inspect
    python -m vit_deep_radiomics_tpu.cli.serve info models/serving/medsam_b4.vdr

    # batched offline inference: (N, H, W, 3) float32 images -> features
    python -m vit_deep_radiomics_tpu.cli.serve run models/serving/medsam_b4.vdr \
        --input slices.npy --output features.npy

    # the trained downstream classifier deploys the same way (static
    # token/volume shapes + validity masks; conf supplies hyperparams)
    python -m vit_deep_radiomics_tpu.cli.serve export-clf \
        models/petct/medsam_transformer_stanford/ct/kfold_0/model_epoch_0007.msgpack \
        -a transformer -m ct --out ct_clf.vdr --batch 8 --max-tokens 512
    python -m vit_deep_radiomics_tpu.cli.serve run ct_clf.vdr \
        --input tokens.npz --output preds.npz   # arrays per in_spec
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export / run self-contained serving artifacts")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="serialize a model to a .vdr file")
    ex.add_argument("-mn", "--model-name", default="medsam",
                    help="medsam or dinov2_vit{s,b,l,g}14")
    ex.add_argument("-mp", "--model-path", default=None,
                    help=".pth checkpoint to convert (random init if "
                         "absent)")
    ex.add_argument("-o", "--out", required=True, help="output .vdr path")
    ex.add_argument("-b", "--batch", type=int, default=4,
                    help="static serving batch size (one artifact per "
                         "batch size)")
    ex.add_argument("--precision", default="fast",
                    choices=["fast", "parity", "bf16", "fp32",
                             "inference", "int8"])
    ex.add_argument("--image-size", type=int, default=None)
    ex.add_argument("--no-flash", action="store_true")
    ex.add_argument("--platforms", nargs="+", default=None,
                    help="lower for multiple targets in one artifact "
                         "(e.g. --platforms cpu tpu); flash kernels are "
                         "TPU-only — combine with --no-flash")
    ex.add_argument("--dinov2-mode", default="full",
                    choices=["patch_embed", "full"],
                    help="dinov2 backbones: patch-embed-only tokens "
                         "(reference parity) or full dense tokens")

    exc = sub.add_parser(
        "export-clf",
        help="serialize a trained downstream classifier to a .vdr file")
    exc.add_argument("checkpoint",
                     help="fold checkpoint (model_epoch_NNNN.msgpack)")
    exc.add_argument("-a", "--arch", default="transformer",
                     choices=["transformer", "conv"])
    exc.add_argument("-m", "--modality", default="ct",
                     help="ct/pet/chest/petct/petchest")
    exc.add_argument("-o", "--out", required=True, help="output .vdr path")
    exc.add_argument("-b", "--batch", type=_batch_size_or_poly, default="8",
                     help="static serving batch size, or 'poly' for a "
                          "shape-polymorphic batch dimension (one "
                          "artifact serves any batch, no padding)")
    exc.add_argument("--max-tokens", type=int, default=512,
                     help="static token-axis length (transformer archs)")
    exc.add_argument("--conv-shape", type=int, nargs=3,
                     default=(13, 12, 12), metavar=("S", "H", "W"),
                     help="static volume shape (conv arch)")
    exc.add_argument("--num-classes", type=int, default=2)
    exc.add_argument("--platforms", nargs="+", default=None,
                     help="lower for multiple targets in one artifact "
                          "(e.g. --platforms cpu tpu)")
    exc.add_argument("--precision", default="fast",
                     choices=["fast", "parity", "bf16", "fp32",
                             "inference", "int8"])

    exp = sub.add_parser(
        "export-pipeline",
        help="one fused artifact: images -> dense descriptors -> masked "
             "tokens -> classifier logits (the two stages the reference "
             "runs as separate Python processes with a feature store "
             "between them)")
    exp.add_argument("checkpoint",
                     help="trained classifier fold checkpoint "
                          "(model_epoch_NNNN.msgpack)")
    exp.add_argument("-mn", "--model-name", default="medsam",
                     help="backbone: medsam or dinov2_vit{s,b,l,g}14")
    exp.add_argument("-mp", "--model-path", default=None,
                     help="backbone .pth to convert (random init if "
                          "absent)")
    exp.add_argument("-a", "--arch", default="transformer",
                     choices=["transformer", "conv"])
    exp.add_argument("-m", "--modality", default="ct",
                     help="ct, pet, chest — or petct/petchest for the "
                          "bimodal cross-attention pipeline (two image "
                          "stacks in one artifact)")
    exp.add_argument("-o", "--out", required=True, help="output .vdr path")
    exp.add_argument("-b", "--batch", type=int, default=1,
                     help="patients per call (each is a slices-deep "
                          "volume)")
    exp.add_argument("--slices", type=int, default=13,
                     help="static slice count per volume (match the "
                          "trainer's window: 13 CT / 2 PET); bimodal: "
                          "the CT stack's count")
    exp.add_argument("--pet-slices", type=int, default=2,
                     help="bimodal only: PET stack slice count")
    exp.add_argument("--max-tokens", type=int, default=512,
                     help="static masked-token budget (transformer arch)")
    exp.add_argument("--image-size", type=int, default=None)
    exp.add_argument("--precision", default="fast",
                     choices=["fast", "parity", "bf16", "fp32",
                              "inference"])
    exp.add_argument("--no-flash", action="store_true")
    exp.add_argument("--num-classes", type=int, default=2)
    exp.add_argument("--platforms", nargs="+", default=None)
    exp.add_argument("--input-mode", default="rgb",
                     choices=["rgb", "raw-hu"],
                     help="rgb: pre-resized (B,S,size,size,3) f32 "
                          "inputs. raw-hu: native-resolution scanner "
                          "output (int16 HU for CT, f32 for PET) with "
                          "windowing/HU->RGB/PET-norm + resize fused "
                          "into the graph — ~24x less upload per CT "
                          "volume")
    exp.add_argument("--native-size", type=int, default=512,
                     help="raw-hu input resolution (scanner matrix, "
                          "512 for CT)")
    exp.add_argument("--pet-native-size", type=int, default=None,
                     help="bimodal raw-hu: PET native resolution "
                          "(PET matrices are typically 128-256; "
                          "default: --native-size)")

    info = sub.add_parser("info", help="print a .vdr artifact's header")
    info.add_argument("artifact")

    run = sub.add_parser("run", help="batched inference from an artifact")
    run.add_argument("artifact")
    run.add_argument("-i", "--input", required=True,
                     help="dense artifact: .npy/.npz of (N, H, W, 3) "
                          "float32 images (for .npz pass --key). "
                          "classifier artifact: .npz with one array per "
                          "input in the artifact's in_spec (masks may be "
                          "omitted: all-valid assumed)")
    run.add_argument("--key", default=None,
                     help="array name inside an .npz input")
    run.add_argument("--overlap", action="store_true",
                     help="double-buffer host->device uploads: enqueue "
                          "batch j+1's transfers while batch j computes "
                          "(throughput mode; per-batch latencies then "
                          "measure the pipelined step, not isolated "
                          "round trips)")
    run.add_argument("--poly-chunk", type=int, default=1024,
                     help="poly-batch artifacts: stream this many items "
                          "per device call instead of one giant batch "
                          "(0 = the whole input in one call)")
    run.add_argument("--labels", default=None,
                     help="classifier artifacts: optional .npy of (N,) "
                          "{0,1} labels — adds AUC/accuracy/F1 (device "
                          "metric kernels) to the report line")
    run.add_argument("-o", "--output", required=True,
                     help="dense: output .npy of features; classifier: "
                          "output .npz with one array per out_name")

    srv = sub.add_parser(
        "server",
        help="HTTP inference endpoint around a .vdr artifact (the "
             "reference has no deployment story at all): POST /infer "
             "with an .npz body -> .npz response; GET /health")
    srv.add_argument("artifact")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8400)
    srv.add_argument("--max-body-mb", type=int, default=512)
    srv.add_argument("--poly-chunk", type=int, default=1024)
    return p


def _export(args) -> int:
    from ..engine.extract import DenseExtractor, ExtractionConfig
    from ..engine.serve import export_dense_model

    if args.precision == "int8":
        # live footgun guard — see cli/extract.py / ops/quant.py
        from ..ops.quant import warn_if_int8_emulated

        ratio = warn_if_int8_emulated()
        print(f"int8/bf16 measured matmul rate ratio: {ratio:.2f}")

    cfg = ExtractionConfig(
        model_name=args.model_name,
        model_path=args.model_path,
        image_size=args.image_size,
        precision=args.precision,
        use_flash=not args.no_flash,
        dinov2_mode=args.dinov2_mode,
    )
    # DenseExtractor owns the name->config mapping and the .pth
    # converter dispatch; reuse it for param construction.
    ext = DenseExtractor(cfg)
    path = export_dense_model(
        ext.params, ext.backbone_cfg, args.out,
        batch=args.batch, policy=args.precision,
        use_flash=not args.no_flash,
        patch_embed_only=ext.model.patch_embed_only,
        platforms=tuple(args.platforms) if args.platforms else None,
    )
    print(path)
    return 0


def _export_clf(args) -> int:
    from flax import serialization

    from ..engine.serve import export_classifier
    from ..utils.config import load_conf

    with open(args.checkpoint, "rb") as fh:
        state = serialization.msgpack_restore(fh.read())
    variables = state["params"] if "params" in state else state
    path = export_classifier(
        variables, load_conf(), args.arch, args.modality, args.out,
        batch=args.batch, max_tokens=args.max_tokens,
        conv_shape=tuple(args.conv_shape), policy=args.precision,
        num_classes=args.num_classes,
        platforms=tuple(args.platforms) if args.platforms else None,
    )
    print(path)
    return 0


def _export_pipeline(args) -> int:
    from flax import serialization

    from ..engine.extract import DenseExtractor, ExtractionConfig
    from ..engine.serve import export_pipeline
    from ..utils.config import load_conf

    with open(args.checkpoint, "rb") as fh:
        state = serialization.msgpack_restore(fh.read())
    variables = state["params"] if "params" in state else state
    # the extractor owns the backbone name->config mapping + .pth
    # converter dispatch, exactly like the dense export
    ext = DenseExtractor(ExtractionConfig(
        model_name=args.model_name, model_path=args.model_path,
        image_size=args.image_size, precision=args.precision,
        use_flash=not args.no_flash,
    ))
    path = export_pipeline(
        ext.params, ext.backbone_cfg, variables, load_conf(),
        args.arch, args.modality, args.out,
        slices=args.slices, max_tokens=args.max_tokens, batch=args.batch,
        policy=args.precision, use_flash=not args.no_flash,
        num_classes=args.num_classes,
        platforms=tuple(args.platforms) if args.platforms else None,
        input_mode=args.input_mode.replace("-", "_"),
        native_size=args.native_size,
        pet_slices=args.pet_slices,
        pet_native_size=args.pet_native_size,
    )
    print(path)
    return 0


def _info(args) -> int:
    from ..engine.serve import load_exported

    print(json.dumps(load_exported(args.artifact).meta, indent=2))
    return 0


def _batch_size_or_poly(text: str):
    """argparse type for --batch: a positive int, or the literal 'poly'."""
    if text == "poly":
        return text
    try:
        value = int(text)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected a positive integer or 'poly', got {text!r}")
    if value < 1:
        raise argparse.ArgumentTypeError(
            f"batch size must be >= 1, got {value}")
    return value


def _load_images(path: str, key: str | None):
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            names = list(z.files)
            if key is None:
                if len(names) != 1:
                    raise SystemExit(
                        f"{path} holds {names}; pick one with --key")
                key = names[0]
            return np.asarray(z[key], dtype=np.float32)
    return np.asarray(np.load(path), dtype=np.float32)


def _run_classifier(args, model) -> int:
    """Batched classifier inference from an .npz of named inputs.

    Arrays must match the artifact's ``in_spec`` names; omitted masks
    default to all-valid.  Shorter token/volume axes than the static
    spec are zero-padded with the mask cleared over the padding; the
    batch axis pads to the static serving batch.
    """
    import numpy as np

    if not args.input.endswith(".npz"):
        raise SystemExit(
            "classifier artifacts take an .npz input with one array per "
            f"in_spec entry {list(model.meta['in_spec'])}")
    in_spec = model.meta["in_spec"]
    batch = model.meta["batch"]
    with np.load(args.input) as z:
        given = {k: np.asarray(z[k]) for k in z.files}
    unknown = set(given) - set(in_spec)
    if unknown:
        raise SystemExit(f"unknown input arrays {sorted(unknown)}; "
                         f"this artifact takes {list(in_spec)}")

    # batch size from the first provided data array
    data_names = [k for k in in_spec if not k.endswith("mask")]
    try:
        n = next(given[k].shape[0] for k in data_names if k in given)
    except StopIteration:
        raise SystemExit(f"missing data arrays; need {data_names}")

    inputs = []
    for name, (shape, dtype) in in_spec.items():
        is_mask = name.endswith("mask")
        if name in given:
            arr = given[name]
        elif is_mask:
            # default mask: valid over the matching data array's
            # provided extent, False over the padding added below
            # (mask dims mirror the data array's non-feature dims)
            data_name = name.replace("mask", "tokens").replace(
                "valid_tokens", "volume")
            arr = np.zeros((n,) + tuple(shape[1:]), bool)
            if data_name in given:
                ext = given[data_name].shape[:arr.ndim]
                arr[tuple(slice(0, e) for e in ext)] = True
            else:
                arr[:] = True
        else:
            raise SystemExit(f"missing required input '{name}'")
        if arr.shape[0] != n:
            raise SystemExit(
                f"'{name}' batch {arr.shape[0]} != {n} of the data arrays")
        if arr.ndim != len(shape):
            raise SystemExit(
                f"'{name}' must have {len(shape)} dims {shape}; "
                f"got {list(arr.shape)}")
        # zero-pad the non-batch axes up to the static spec — except the
        # feature axis of data arrays, which must match exactly (padding
        # a wrong feature_dim would silently produce garbage logits)
        if not is_mask and arr.shape[-1] != shape[-1]:
            raise SystemExit(
                f"'{name}' feature dim {arr.shape[-1]} != the artifact's "
                f"{shape[-1]}")
        pads = [(0, 0)]
        for have, want_ in zip(arr.shape[1:], shape[1:]):
            if have > want_:
                raise SystemExit(
                    f"'{name}' axis size {have} exceeds the artifact's "
                    f"static {want_}")
            pads.append((0, want_ - have))
        if any(p != (0, 0) for p in pads):
            arr = np.pad(arr, pads)
        inputs.append(
            arr.astype(bool if dtype == "bool" else np.dtype(dtype),
                       copy=False))

    if n == 0:
        raise SystemExit("input holds 0 items; nothing to run")
    poly = batch == "poly"
    if poly:
        # shape-polymorphic artifact: stream --poly-chunk items per call
        # with no batch padding (the runtime specializes per distinct
        # shape, so this costs at most two specializations: the chunk
        # size and the final remainder)
        batch = min(n, max(1, getattr(args, "poly_chunk", None) or n))
    else:
        batch = int(batch)
    pad = 0 if poly else (-n) % batch
    overlap = bool(getattr(args, "overlap", False))

    def _chunk(i):
        chunk = []
        for arr in inputs:
            part = arr[i:i + batch]
            if part.shape[0] < batch and not poly:
                part = np.pad(
                    part, [(0, batch - part.shape[0])]
                    + [(0, 0)] * (part.ndim - 1))
            chunk.append(part)
        if overlap:
            # enqueue the H2D transfers now so the NEXT batch's upload
            # rides under the current batch's device compute — the
            # binding cost of remote serving is the host→device link
            # (artifacts/pipeline_serve_raw_r3.json: upload ≈ 185 of
            # 427 ms p50 even in raw mode)
            import jax

            chunk = [jax.device_put(a) for a in chunk]
        return chunk

    starts = list(range(0, n + pad, batch))
    outs = None
    lat = []
    t0 = time.time()
    cur = _chunk(starts[0]) if starts else None
    for j, i in enumerate(starts):
        tb = time.time()
        got = model(*cur)
        got = got if isinstance(got, (tuple, list)) else (got,)
        # upload the next batch while the device is busy with this one
        cur = _chunk(starts[j + 1]) if j + 1 < len(starts) else None
        got = [np.asarray(g) for g in got]  # materialize = sync
        lat.append(time.time() - tb)
        if outs is None:
            outs = [[] for _ in got]
        for acc, g in zip(outs, got):
            acc.append(g)
    dt = time.time() - t0
    named = {name: np.concatenate(acc)[:n]
             for name, acc in zip(model.meta["out_names"], outs)}
    np.savez(args.output, **named)
    from ..utils.profiling import memory_summary_gib

    extra = memory_summary_gib()
    if getattr(args, "labels", None):
        extra["eval"] = _eval_logits(named, np.load(args.labels), n)
    print(json.dumps({
        "items": n, "batch": batch, "seconds": round(dt, 3),
        "items_per_s": round(n / dt, 2) if dt > 0 else None,
        **({"overlap": True} if overlap else {}),
        **_latency_stats(lat),
        **getattr(args, "_warm_stats", {}),
        "outputs": {k: list(v.shape) for k, v in named.items()},
        "output": args.output,
        **extra,
    }))
    return 0


def _eval_logits(named: dict, labels, n: int) -> dict:
    """AUC/accuracy/macro-F1 of each logits output vs (N,) {0,1} labels,
    via the device metric kernels (ops/metrics.py) — the same math the
    trainer reports per epoch."""
    import numpy as np

    from ..ops.metrics import binary_report_metrics, roc_auc

    labels = np.asarray(labels)
    if labels.ndim != 1:
        raise SystemExit(
            "--labels must be a flat (N,) array of 0/1 labels; got "
            f"shape {list(labels.shape)} (one-hot arrays: argmax first)")
    if labels.shape[0] != n:
        raise SystemExit(
            f"--labels has {labels.shape[0]} entries for {n} inputs")
    labels = labels.astype(np.float32)
    out = {}
    for name, lg in named.items():
        if not name.startswith("logits") or lg.ndim != 2:
            continue
        if lg.shape[1] != 2:
            raise SystemExit(
                "--labels evaluation supports binary heads only; output "
                f"'{name}' has {lg.shape[1]} classes")
        lg = lg - lg.max(axis=-1, keepdims=True)
        e = np.exp(lg)
        score = (e / e.sum(axis=-1, keepdims=True))[:, 1]
        pred = (score >= 0.5).astype(np.float32)
        rep = binary_report_metrics(labels, pred)
        out[name] = {
            "auc": float(roc_auc(labels, score)),
            "accuracy": float(rep["accuracy"]),
            "macro_f1": float(rep["macro_f1"]),
        }
    return out


def _latency_stats(lat: list) -> dict:
    """Per-batch wall latencies → p50/p99 (ms).  The first batch carries
    the deserialized program's load/compile, so it is reported apart."""
    if not lat:
        return {}
    import numpy as np

    steady = lat[1:] or lat
    return {
        "first_batch_ms": round(lat[0] * 1e3, 2),
        "latency_p50_ms": round(float(np.percentile(steady, 50)) * 1e3, 2),
        "latency_p99_ms": round(float(np.percentile(steady, 99)) * 1e3, 2),
    }


def _run(args) -> int:
    import numpy as np

    from ..core.mesh import enable_persistent_compile_cache
    from ..engine.serve import load_exported

    enable_persistent_compile_cache()
    model = load_exported(args.artifact)
    # AOT-compile up front through the on-disk EXECUTABLE cache
    # (engine/serve.py::ExportedModel.warm): the first run of an
    # artifact on a machine pays the full compile once and saves the
    # binary; every later `serve run` loads it in seconds instead of
    # the 2-3-minute on-chip compile (VDR_EXEC_CACHE=off disables).
    t_warm = time.time()
    model.warm()
    warm_stats = {
        "warm_s": round(time.time() - t_warm, 2),
        "exec_cache": model.cache_status,
        **model.warm_stats,
    }
    # raw-H2D link probe: uploading a plain 64 MiB array bounds the
    # achievable program/weights upload rate — if warm_upload_mbps is
    # at this rate, the warm cost is link-bound, not avoidable
    # (VERDICT r4 item 6).  Opt-in (VDR_WARM_PROBE=1, set by
    # tools/serve_warmstart.py): it costs two 64 MiB uploads + a tiny
    # compile, which production `serve run` startups should not pay.
    if os.environ.get("VDR_WARM_PROBE") == "1":
        try:
            import jax
            import jax.numpy as jnp

            from ..utils.profiling import device_sync

            if jax.default_backend() == "tpu":
                probe = np.zeros((16, 1024, 1024), np.float32)  # 64 MiB
                # warm the EXACT timed expression: the first `+ 1.0`
                # dispatch pays a remote compile on this backend, which
                # would otherwise be billed to the link rate
                device_sync(jnp.asarray(probe) + 1.0)
                t0 = time.time()
                device_sync(jnp.asarray(probe) + 1.0)
                warm_stats["h2d_probe_mbps"] = round(
                    probe.nbytes / 2**20 / max(time.time() - t0, 1e-9),
                    1)
        except Exception:  # noqa: BLE001 — telemetry only
            pass
    print(json.dumps(warm_stats), file=sys.stderr)
    args._warm_stats = warm_stats
    if model.meta.get("kind") in ("classifier", "pipeline"):
        # both are named-in_spec artifacts; the pipeline's images/
        # grid_mask/spatial_res route through the same padding/latency/
        # eval machinery
        return _run_classifier(args, model)
    if getattr(args, "labels", None):
        raise SystemExit(
            "--labels applies to classifier artifacts; this artifact "
            "serves dense feature maps (no logits to evaluate)")
    batch = int(model.meta["batch"])
    size = int(model.meta["image_size"])
    images = _load_images(args.input, args.key)
    if images.ndim != 4 or images.shape[1:] != (size, size, 3):
        raise SystemExit(
            f"input must be (N, {size}, {size}, 3) float32 for this "
            f"artifact; got {images.shape}")

    n = images.shape[0]
    if n == 0:
        raise SystemExit("input holds 0 images; nothing to run")
    pad = (-n) % batch
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
    t0 = time.time()
    outs = []
    lat = []
    for i in range(0, images.shape[0], batch):
        tb = time.time()
        outs.append(np.asarray(model(images[i:i + batch])))
        lat.append(time.time() - tb)
    feats = np.concatenate(outs)[:n]
    dt = time.time() - t0
    np.save(args.output, feats)
    print(json.dumps({
        "images": n, "batch": batch, "seconds": round(dt, 3),
        "img_per_s": round(n / dt, 2) if dt > 0 else None,
        **_latency_stats(lat),
        **getattr(args, "_warm_stats", {}),
        "out_shape": list(feats.shape), "output": args.output,
    }))
    return 0


def make_server(model, *, poly_chunk: int = 1024,
                max_body_mb: int = 512):
    """HTTP request handler class around a warm :class:`ExportedModel`.

    Endpoints (the whole deployment surface the reference lacks):

    * ``GET /health`` → JSON: artifact meta + executable-cache status.
    * ``POST /infer`` with an ``.npz`` body → ``.npz`` response.
      Dense artifacts take one array (any name) of (N, size, size, 3)
      images and answer ``{"features": ...}``; classifier/pipeline
      artifacts take one array per ``in_spec`` name (masks optional)
      with the same padding semantics as ``serve run`` — the request
      round-trips through temp files so the battle-tested CLI
      validation/padding path serves HTTP verbatim.

    Inference is serialized with a lock (one device).  For bulk
    offline throughput prefer ``serve run --overlap``; this endpoint
    is the online story (per-request p50 ≈ the run CLI's steady-state
    latency once ``warm()`` has absorbed the executable upload).
    """
    import tempfile
    import threading
    import types
    from http.server import BaseHTTPRequestHandler

    import numpy as np

    lock = threading.Lock()
    kind = model.meta.get("kind", "dense")

    def infer_npz(body: bytes) -> bytes:
        import io

        with tempfile.TemporaryDirectory() as tmp:
            tmp = Path(tmp)
            inp = tmp / "in.npz"
            outp = tmp / ("out.npy" if kind == "dense" else "out.npz")
            inp.write_bytes(body)
            if kind == "dense":
                with np.load(inp) as z:
                    if len(z.files) != 1:
                        raise ValueError(
                            "dense artifacts take exactly one image "
                            "array")
                    images = np.asarray(z[z.files[0]], np.float32)
                batch = int(model.meta["batch"])
                size = int(model.meta["image_size"])
                if images.ndim != 4 or images.shape[1:] != (size, size,
                                                            3):
                    raise ValueError(
                        f"need (N, {size}, {size}, 3) f32 images; got "
                        f"{images.shape}")
                n = images.shape[0]
                pad = (-n) % batch
                if pad:
                    images = np.concatenate([
                        images,
                        np.zeros((pad,) + images.shape[1:],
                                 images.dtype)])
                outs = [np.asarray(model(images[i:i + batch]))
                        for i in range(0, images.shape[0], batch)]
                buf = io.BytesIO()
                np.savez(buf, features=np.concatenate(outs)[:n])
                return buf.getvalue()
            ns = types.SimpleNamespace(
                input=str(inp), output=str(outp), labels=None,
                overlap=False, poly_chunk=poly_chunk)
            _run_classifier(ns, model)
            return outp.read_bytes()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *fa):  # stderr, not stdout
            print("# " + fmt % fa, file=sys.stderr)

        def _reply(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                self._reply(404, b'{"error": "unknown path"}',
                            "application/json")
                return
            self._reply(200, json.dumps({
                "status": "ok", "kind": kind,
                "exec_cache": model.cache_status,
                "meta": {k: v for k, v in model.meta.items()
                         if k != "in_spec"},
                "in_spec": model.meta.get("in_spec"),
            }).encode(), "application/json")

        def do_POST(self):
            if self.path != "/infer":
                self._reply(404, b'{"error": "unknown path"}',
                            "application/json")
                return
            length = int(self.headers.get("Content-Length", 0))
            if length > max_body_mb << 20:
                self._reply(413, json.dumps({
                    "error": f"body over {max_body_mb} MiB"}).encode(),
                    "application/json")
                return
            body = self.rfile.read(length)
            try:
                with lock:
                    out = infer_npz(body)
            except SystemExit as exc:      # CLI validation paths raise
                self._reply(400, json.dumps(
                    {"error": str(exc)}).encode(), "application/json")
                return
            except Exception as exc:  # noqa: BLE001 — surface to caller
                self._reply(400, json.dumps(
                    {"error": repr(exc)[:500]}).encode(),
                    "application/json")
                return
            self._reply(200, out, "application/octet-stream")

    return Handler


def _server(args) -> int:
    from http.server import ThreadingHTTPServer

    from ..core.mesh import enable_persistent_compile_cache
    from ..engine.serve import load_exported

    enable_persistent_compile_cache()
    model = load_exported(args.artifact)
    t0 = time.time()
    model.warm()                 # absorb compile/upload pre-request
    print(json.dumps({
        "serving": args.artifact, "host": args.host, "port": args.port,
        "warm_s": round(time.time() - t0, 2),
        "exec_cache": model.cache_status, **model.warm_stats,
    }), flush=True)
    handler = make_server(model, poly_chunk=args.poly_chunk,
                          max_body_mb=args.max_body_mb)
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("serve"):
        return 0  # multi-process launch: host job runs on the primary
    return {"export": _export, "export-clf": _export_clf,
            "export-pipeline": _export_pipeline, "info": _info,
            "run": _run, "server": _server}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
