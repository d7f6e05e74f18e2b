"""CLI: best-model CLS-embedding extraction + 3D projection.

Working rebuild of /root/reference/src/umap_cls_token.py (stale upstream):
sweeps arch × dataset × modality, loads each experiment's best
checkpoint per the summary CSV, collects CLS embeddings, projects to 3D
(UMAP or PCA fallback) and writes scatter HTMLs plus
``data/petct_embeddings_umap.parquet``.
"""

from __future__ import annotations

import argparse
import itertools
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="CLS-embedding UMAP projection")
    p.add_argument("--backbone", default="medsam")
    p.add_argument("--archs", nargs="*", default=["conv", "transformer"])
    p.add_argument("--datasets", nargs="*",
                   default=["santa_maria", "stanford"])
    p.add_argument("--modalities", nargs="*", default=["pet", "ct"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--metrics-dir", default="metrics")
    p.add_argument("--plots-dir", default="plots")
    p.add_argument("--experiment", default="petct")
    args = p.parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("umap_embed"):
        return 0  # multi-process launch: host job runs on the primary

    import pandas as pd

    from ..analysis.embeddings import (
        best_fold_epoch_from_summary,
        extract_embeddings,
        project_3d,
        write_scatter3d_html,
    )
    from ..engine.train import TrainerConfig
    from ..utils.config import load_conf

    cfg = load_conf()
    feature_dir = os.path.join(args.data_dir, "features")
    summary_csv = os.path.join(
        args.metrics_dir, f"{args.experiment}_metrics_sumary.csv")
    df_all = pd.read_parquet(os.path.join(feature_dir, "petct.parquet"))

    frames = []
    for arch, dataset, modality in itertools.product(
        args.archs, args.datasets, args.modalities
    ):
        try:
            kfold, epoch = best_fold_epoch_from_summary(
                summary_csv, dataset, modality, arch)
        except (ValueError, FileNotFoundError) as exc:
            print(f"skip {arch}/{dataset}/{modality}: {exc}")
            continue
        fold_dir = os.path.join(
            args.models_dir, args.experiment,
            f"{args.backbone}_{arch}_{dataset}", modality, f"kfold_{kfold}",
        )
        tcfg = TrainerConfig(arch=arch, modality=modality,
                             dataset=dataset, backbone=args.backbone,
                             batch_size=1)
        df = df_all[(df_all["dataset"] == dataset)].copy()
        # 'chest' in modality, not ==: petchest trains on the chest store
        # (same test as cli/train.py:66, engine/train.py::train_kfold)
        modality_b = "chest" if "chest" in modality else "ct"
        emb = extract_embeddings(
            df, cfg, tcfg,
            os.path.join(feature_dir, f"features_masks_{modality_b}.hdf5"),
            os.path.join(feature_dir, "features_masks_pet.hdf5"),
            fold_dir, epoch,
        )
        import numpy as np

        coords, projector = project_3d(
            np.stack(emb["embedding"].to_list()))
        emb[["umap_x", "umap_y", "umap_z"]] = coords
        emb["projector"] = projector
        emb["modality"] = modality
        emb["arch"] = arch
        emb["dataset"] = dataset
        write_scatter3d_html(
            emb,
            os.path.join(
                args.plots_dir, "umap",
                f"{args.backbone}_{arch}_{dataset}_{modality}_umap.html"),
            title=(f"{args.backbone} {arch} {dataset} {modality} "
                   f"[{projector}]"),
        )
        frames.append(emb)

    if frames:
        out = pd.concat(frames)
        out["embedding"] = out["embedding"].map(list)
        out_path = os.path.join(args.data_dir, "petct_embeddings_umap.parquet")
        out.to_parquet(out_path)
        print(f"wrote {out_path} ({len(out)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
