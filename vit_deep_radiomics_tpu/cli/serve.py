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
"""

from __future__ import annotations

import argparse
import json
import sys
import time


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
                    choices=["fast", "parity", "bf16", "fp32"])
    ex.add_argument("--image-size", type=int, default=None)
    ex.add_argument("--no-flash", action="store_true")
    ex.add_argument("--dinov2-mode", default="full",
                    choices=["patch_embed", "full"],
                    help="dinov2 backbones: patch-embed-only tokens "
                         "(reference parity) or full dense tokens")

    info = sub.add_parser("info", help="print a .vdr artifact's header")
    info.add_argument("artifact")

    run = sub.add_parser("run", help="batched inference from an artifact")
    run.add_argument("artifact")
    run.add_argument("-i", "--input", required=True,
                     help=".npy/.npz of (N, H, W, 3) float32 images "
                          "(for .npz pass --key)")
    run.add_argument("--key", default=None,
                     help="array name inside an .npz input")
    run.add_argument("-o", "--output", required=True,
                     help="output .npy of (N, grid, grid, C) features")
    return p


def _export(args) -> int:
    from ..engine.extract import DenseExtractor, ExtractionConfig
    from ..engine.serve import export_dense_model

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
    )
    print(path)
    return 0


def _info(args) -> int:
    from ..engine.serve import load_exported

    print(json.dumps(load_exported(args.artifact).meta, indent=2))
    return 0


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


def _run(args) -> int:
    import numpy as np

    from ..core.mesh import enable_persistent_compile_cache
    from ..engine.serve import load_exported

    enable_persistent_compile_cache()
    model = load_exported(args.artifact)
    batch = int(model.meta["batch"])
    size = int(model.meta["image_size"])
    images = _load_images(args.input, args.key)
    if images.ndim != 4 or images.shape[1:] != (size, size, 3):
        raise SystemExit(
            f"input must be (N, {size}, {size}, 3) float32 for this "
            f"artifact; got {images.shape}")

    n = images.shape[0]
    pad = (-n) % batch
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
    t0 = time.time()
    outs = []
    for i in range(0, images.shape[0], batch):
        outs.append(np.asarray(model(images[i:i + batch])))
    feats = np.concatenate(outs)[:n]
    dt = time.time() - t0
    np.save(args.output, feats)
    print(json.dumps({
        "images": n, "batch": batch, "seconds": round(dt, 3),
        "img_per_s": round(n / dt, 2) if dt > 0 else None,
        "out_shape": list(feats.shape), "output": args.output,
    }))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("serve"):
        return 0  # multi-process launch: host job runs on the primary
    return {"export": _export, "info": _info, "run": _run}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
