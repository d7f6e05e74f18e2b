"""CLI: k-fold classifier training.

Mirrors the reference trainer CLI
(/root/reference/src/train_models.py:500-515)::

    python -m vit_deep_radiomics_tpu.cli.train \
        -a transformer -d stanford -m petct -l crossmodal -e petct
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train 3D transformer or CNN nodule classifiers (k-fold)"
    )
    p.add_argument("-a", "--arch", default="transformer",
                   choices=["transformer", "conv"])
    p.add_argument("-d", "--dataset", default="stanford",
                   help="stanford or santa_maria")
    p.add_argument("-b", "--backbone", default="medsam")
    p.add_argument("-m", "--modality", default="petchest",
                   choices=["ct", "pet", "chest", "petct", "petchest"])
    p.add_argument("-l", "--loss", default="focal",
                   choices=["focal", "crossmodal"])
    p.add_argument("-e", "--experiment", default="petct")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override config batch size")
    p.add_argument("--precision", default="fast")
    p.add_argument("--folds", nargs="*", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of training here")
    p.add_argument("--use-sampler", action="store_true",
                   help="class-balanced resampling with replacement "
                        "(the reference's WeightedRandomSampler, off by "
                        "default there too, train_models.py:521)")
    p.add_argument("--whole-volume", action="store_true",
                   help="no slice chunking: one unchunked token set per "
                        "patient; with --data-parallel the classifier "
                        "runs ring-attention sequence parallelism over "
                        "the mesh")
    p.add_argument("--fold-parallel", action="store_true",
                   help="train every fold in ONE vmapped lockstep "
                        "program (engine/foldpar.py) instead of the "
                        "sequential fold loop — one dispatch advances "
                        "all folds; with --data-parallel the FOLD axis "
                        "shards over the device mesh (one fold per "
                        "device, zero collectives); excludes "
                        "--whole-volume and mid-fold resume")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over a data mesh spanning every "
                        "visible device — including other hosts' under "
                        "a multi-process launch (core/distributed.py); "
                        "batch_size should be a multiple of the device "
                        "count for the transfer savings")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import pandas as pd

    from ..core.distributed import initialize_from_env
    from ..engine.train import TrainerConfig, train_kfold
    from ..utils.config import load_conf

    lenv = initialize_from_env()  # multi-host launch (no-op single-process)
    mesh = None
    if args.data_parallel:
        import jax

        if jax.device_count() > 1:
            from ..core.mesh import make_mesh

            mesh = make_mesh()
    cfg = load_conf()
    modality_b = "chest" if "chest" in args.modality else "ct"
    feature_dir = os.path.join(args.data_dir, "features")

    folds = args.folds
    # resolve the process grid from the launch env OR the live JAX grid —
    # VDR_DISTRIBUTED=auto / JAX_COORDINATOR_ADDRESS launches initialize
    # jax.distributed without a LaunchEnv description
    nproc = lenv.num_processes if lenv is not None else 1
    pid = lenv.process_id if lenv is not None else 0
    if nproc <= 1:
        import jax

        if jax.process_count() > 1:
            nproc, pid = jax.process_count(), jax.process_index()
    if mesh is None and nproc > 1:
        # Multi-process launch WITHOUT a global data mesh: every process
        # would otherwise train identical folds and race writes to the
        # same kfold_k artifacts.  Shard folds round-robin instead (fold
        # directories are disjoint), mirroring cli/sweep's grid sharding.
        from ..core.distributed import shard_for_process

        fold_map = cfg["kfold_patients"][modality_b][args.dataset]
        all_folds = folds if folds is not None else list(fold_map.keys())
        folds = shard_for_process(all_folds, pid=pid, nproc=nproc)
        print(f"[train] process {pid}/{nproc}: "
              f"folds {folds} of {all_folds}")

    df = pd.read_parquet(os.path.join(feature_dir, "petct.parquet"))
    batch_size = (
        args.batch_size
        if args.batch_size is not None
        else cfg["models"][args.arch].get("batch_size", 1)
    )
    tcfg = TrainerConfig(
        arch=args.arch, modality=args.modality, loss=args.loss,
        dataset=args.dataset, backbone=args.backbone,
        experiment=args.experiment, batch_size=max(1, batch_size),
        precision=args.precision, max_epochs=args.max_epochs,
        use_sampler=args.use_sampler, whole_volume=args.whole_volume,
        fold_parallel=args.fold_parallel,
    )
    import contextlib

    from ..utils.profiling import trace

    profiler = (
        trace(args.profile_dir) if args.profile_dir
        else contextlib.nullcontext()
    )
    with profiler:
        train_kfold(
            df, cfg, tcfg,
            hdf5_ct_path=os.path.join(
                feature_dir, f"features_masks_{modality_b}.hdf5"),
            hdf5_pet_path=os.path.join(
                feature_dir, "features_masks_pet.hdf5"),
            models_dir=args.models_dir,
            mesh=mesh,
            folds=folds,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
