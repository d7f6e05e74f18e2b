"""CLI: dense-descriptor extraction sweep.

Mirrors the reference extraction CLI
(/root/reference/src/tfds_dense_descriptor.py:364-382)::

    python -m vit_deep_radiomics_tpu.cli.extract \
        --model-name medsam --model-path models/backbones/medsam_vit_b.pth \
        --hdf5-path data/lung_radiomics/lung_radiomics_datasets_isotropic.hdf5 \
        --df-path data/lung_radiomics/lung_radiomics_datasets_isotropic.csv \
        --feature-folder data/features --modality ct
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Extract frozen-ViT dense descriptors (TPU-native)"
    )
    p.add_argument("-mn", "--model-name", default="medsam",
                   help="medsam or dinov2_vit{s,b,l,g}14")
    p.add_argument("-mp", "--model-path", default=None,
                   help=".pth checkpoint to convert (random init if absent)")
    p.add_argument("--source", default="isotropic",
                   choices=["isotropic", "tfds"],
                   help="volume source: isotropic HDF5 (default) or tfds "
                        "patient datasets (the reference CLI's use_tfds "
                        "mode, tfds_dense_descriptor.py:402-447 — with "
                        "its extraction dead-branch fixed)")
    p.add_argument("-h5", "--hdf5-path", default=None,
                   help="isotropic-volume HDF5 dataset "
                        "(required with --source isotropic)")
    p.add_argument("-df", "--df-path", default=None,
                   help="patient metadata CSV (patient_id/egfr/dataset; "
                        "required with --source isotropic)")
    p.add_argument("--data-dir", default=None,
                   help="tfds data_dir (--source tfds)")
    p.add_argument("-f", "--feature-folder",
                   default=os.path.join("data", "features"))
    p.add_argument("-mod", "--modality", default="ct",
                   help="second modality: ct or chest (pet always runs)")
    p.add_argument("--datasets", nargs="*",
                   default=["santa_maria", "stanford"])
    p.add_argument("--precision", default="fast",
                   choices=["fast", "parity", "bf16", "fp32",
                            "inference", "int8"])
    p.add_argument("--slice-batch", type=int, default=4)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--no-flash", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the sweep here")
    p.add_argument("--no-data-parallel", action="store_true",
                   help="keep the forward on one device even when "
                        "multiple devices are visible (default: shard "
                        "the slice batch over a data mesh)")
    p.add_argument("--dinov2-mode", default="patch_embed",
                   choices=["patch_embed", "full"],
                   help="dinov2 backbones: patch-embed-only tokens "
                        "(reference parity) or full-transformer dense "
                        "tokens (the TPU-native mode)")
    p.add_argument("--pipeline-stages", type=int, default=1,
                   help="pipeline the ViT depth over this many devices "
                        "(GPipe over the model mesh axis; for backbones "
                        "too large for one chip).  Must divide both the "
                        "device count and the transformer depth")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.source == "isotropic" and not (args.hdf5_path and args.df_path):
        parser.error(
            "--source isotropic requires --hdf5-path and --df-path")
    from ..core.distributed import initialize_from_env
    from ..engine.extract import (
        DenseExtractor,
        ExtractionConfig,
        extract_isotropic_dataset,
        extract_tfds_dataset,
    )

    initialize_from_env()  # multi-host launch (no-op single-process)

    if args.precision == "int8":
        # live footgun guard: whether int8 contractions are emulated is
        # a backend property that has flipped between rounds (docs/
        # ROADMAP.md r3 table) — probe it, refuse silent slowdowns
        from ..ops.quant import warn_if_int8_emulated

        ratio = warn_if_int8_emulated()
        print(f"int8/bf16 measured matmul rate ratio: {ratio:.2f}")

    cfg = ExtractionConfig(
        model_name=args.model_name,
        model_path=args.model_path,
        image_size=args.image_size,
        slice_batch=args.slice_batch,
        precision=args.precision,
        use_flash=not args.no_flash,
        dinov2_mode=args.dinov2_mode,
        pipeline=args.pipeline_stages > 1,
    )
    import jax

    # under a multi-process launch the sweep work-shards across
    # processes (each runs its own volumes), so device meshes must stay
    # LOCAL — a global mesh would have processes executing different
    # programs over shared device groups
    local = (jax.local_devices() if jax.process_count() > 1
             else None)
    mesh = None
    if args.pipeline_stages > 1:
        from ..core.mesh import make_mesh

        mesh = make_mesh(local, model_parallel=args.pipeline_stages)
    elif not args.no_data_parallel:
        if len(local if local is not None else jax.devices()) > 1:
            from ..core.mesh import make_mesh

            mesh = make_mesh(local)
    extractor = DenseExtractor(cfg, mesh=mesh)
    import contextlib

    from ..utils.profiling import trace

    profiler = (
        trace(args.profile_dir) if args.profile_dir
        else contextlib.nullcontext()
    )
    with profiler:
        if args.source == "tfds":
            # reference tfds dataset ids end in `_dataset`
            # (tfds_dense_descriptor.py:392, 406)
            datasets = tuple(
                d if d.endswith("_dataset") else f"{d}_dataset"
                for d in args.datasets
            )
            written = extract_tfds_dataset(
                args.feature_folder, extractor,
                datasets=datasets, data_dir=args.data_dir,
                modalities=("pet", args.modality),
                progress=print,
            )
        else:
            written = extract_isotropic_dataset(
                args.hdf5_path, args.df_path, args.feature_folder,
                extractor,
                modalities=("pet", args.modality),
                datasets=tuple(args.datasets),
                progress=print,
            )
    if jax.process_count() > 1:
        # every process finished its shard before the primary folds the
        # .part stores into the contract files
        from jax.experimental import multihost_utils

        from ..core.distributed import is_primary
        from ..data.feature_store import merge_part_stores

        multihost_utils.sync_global_devices("vdr_extract_sweep_done")
        if is_primary():
            merged = merge_part_stores(
                args.feature_folder, modalities=("pet", args.modality))
            print(f"merged {len(merged)} part stores")
    print(f"wrote {len(written)} patient parquets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
