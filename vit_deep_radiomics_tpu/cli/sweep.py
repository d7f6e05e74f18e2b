"""CLI: the full experiment sweep in ONE process.

Capability-equivalent of the reference's run_train.sh (10 sequential
``train_models.py`` invocations sweeping arch × dataset × modality ×
loss, run_train.sh:4-13) — but in-process: every remote-tunnel compile
costs ~50 s regardless of program size and cannot be cached across
processes (docs/ROADMAP.md §5c), so one process that shares compiled
step executables across experiments with the same (arch, modality,
loss, precision, batch) signature saves minutes per grid entry over the
shell-loop form.
"""

from __future__ import annotations

import argparse
import os

# the reference's grid (run_train.sh:4-13)
GRID = (
    ("conv", "stanford", "pet", "focal"),
    ("conv", "stanford", "ct", "focal"),
    ("conv", "santa_maria", "pet", "focal"),
    ("conv", "santa_maria", "ct", "focal"),
    ("transformer", "stanford", "pet", "focal"),
    ("transformer", "stanford", "ct", "focal"),
    ("transformer", "santa_maria", "pet", "focal"),
    ("transformer", "santa_maria", "ct", "focal"),
    ("transformer", "stanford", "petct", "crossmodal"),
    ("transformer", "santa_maria", "petct", "crossmodal"),
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Run the full arch × dataset × modality × loss "
                    "experiment grid in one process"
    )
    p.add_argument("-e", "--experiment", default="petct")
    p.add_argument("-b", "--backbone", default="medsam")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--precision", default="fast")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--datasets", nargs="*", default=None,
                   help="restrict the grid to these datasets")
    p.add_argument("--archs", nargs="*", default=None,
                   help="restrict the grid to these archs")
    p.add_argument("--fold-parallel", action="store_true",
                   help="train each experiment's folds in one vmapped "
                        "lockstep program (engine/foldpar.py)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import pandas as pd

    from ..core.distributed import initialize_from_env, shard_for_process
    from ..engine.train import TrainerConfig, train_kfold
    from ..utils.config import load_conf

    initialize_from_env()  # multi-host launch (no-op single-process)
    cfg = load_conf()
    feature_dir = os.path.join(args.data_dir, "features")
    df = pd.read_parquet(os.path.join(feature_dir, "petct.parquet"))

    # under a multi-process launch, grid entries shard round-robin —
    # each experiment's artifact tree (models/<exp>/<backbone>_<arch>_
    # <ds>/<mod>/) is disjoint, so the sweep is embarrassingly parallel
    # across hosts (the reference ran these sequentially,
    # run_train.sh:4-13)
    grid = shard_for_process(GRID)

    # shared compiled-step caches, keyed by everything that changes the
    # step executable's MATH (shapes are keyed inside FoldTrainer)
    caches: dict[tuple, dict] = {}
    for arch, dataset, modality, loss in grid:
        if args.datasets and dataset not in args.datasets:
            continue
        if args.archs and arch not in args.archs:
            continue
        batch_size = cfg["models"][arch].get("batch_size", 1)
        sig = (arch, modality, loss, args.precision, batch_size)
        step_cache = caches.setdefault(sig, {})
        modality_b = "chest" if "chest" in modality else "ct"
        tcfg = TrainerConfig(
            arch=arch, modality=modality, loss=loss, dataset=dataset,
            backbone=args.backbone, experiment=args.experiment,
            batch_size=max(1, batch_size), precision=args.precision,
            max_epochs=args.max_epochs,
            fold_parallel=args.fold_parallel,
        )
        print(f"=== {arch} / {dataset} / {modality} / {loss} ===")
        train_kfold(
            df, cfg, tcfg,
            hdf5_ct_path=os.path.join(
                feature_dir, f"features_masks_{modality_b}.hdf5"),
            hdf5_pet_path=os.path.join(
                feature_dir, "features_masks_pet.hdf5"),
            models_dir=args.models_dir,
            step_cache=step_cache,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
