"""Standalone evaluation: restored checkpoint → classification report.

The reference has no separate evaluation entry point — its test loop is
inlined in the trainer (train_models.py:691-717) and its eval-time
scripts rebuild models ad hoc (umap_cls_token.py:96-107).  This module
is the engine-level ``evaluate()`` (SURVEY.md §7): deterministic
inference of a checkpointed classifier over a metadata frame, returning
the same patient-weighted report dict the trainer logs per epoch.
"""

from __future__ import annotations

import pandas as pd

from ..analysis import reports
from ..data.datasets import PETCTDataset, batch_items, prepare_windows
from ..engine import checkpoint as ckpt
from ..engine.train import FoldTrainer, TrainerConfig, _patient_weights

__all__ = ["evaluate_checkpoint"]


def evaluate_checkpoint(
    df: pd.DataFrame,
    cfg: dict,
    tcfg: TrainerConfig,
    hdf5_ct_path,
    hdf5_pet_path,
    fold_dir,
    epoch: int,
    kfold=0,
    split: str = "test",
) -> dict:
    """Report dict for a checkpoint over *df* (deterministic, no aug)."""
    # mirror train_kfold's modality/window handling (train.py::train_kfold)
    # so chest-modality and whole-volume checkpoints evaluate on the same
    # windows they trained on
    modality_a = "pet"
    modality_b = "chest" if "chest" in tcfg.modality else "ct"
    from ..core.precision import get_policy

    if get_policy(tcfg.precision).quantized:
        # reject before FoldTrainer's guard fires — its "round() kills
        # the gradients" message is about TRAINING and would mislead an
        # inference caller; the real reason here is that the downstream
        # classifiers have no quantized matmuls at all
        raise ValueError(
            "int8 applies to the dense backbone only; the classifiers "
            "have no quantized matmuls — evaluate with 'parity' or "
            "'fast'")
    trainer = FoldTrainer(cfg, tcfg, None, modality_a, modality_b)
    df = df.copy()
    df["flip"] = df["flip"].astype(str)
    dfw = prepare_windows(df, modality_a, modality_b,
                          whole_volume=tcfg.whole_volume)
    ds = PETCTDataset(
        dfw, hdf5_ct_path, hdf5_pet_path,
        use_augmentation=False,
        modality_a=modality_a, modality_b=modality_b,
        feature_dim=cfg["models"][tcfg.arch]["feature_dim"],
        arch=tcfg.arch, num_classes=tcfg.num_classes,
    )
    items = [ds[i] for i in range(len(ds))]
    bkw = {}
    if tcfg.whole_volume:
        # unchunked token sets may exceed the default 4096 bucket cap;
        # extend instead of silently truncating (same as train_fold)
        from ..data.datasets import token_buckets_for

        bkw["buckets"] = token_buckets_for(items)
    batches = list(batch_items(items, tcfg.batch_size, **bkw))
    if not batches:
        raise ValueError(
            f"no evaluable windows for modality '{tcfg.modality}' — the "
            "frame has no rows for its modalities")
    trainer.init_params(batches[0])
    state = ckpt.load_checkpoint(
        {"params": trainer.params, "opt_state": trainer.opt_state,
         "epoch": 0},
        fold_dir, epoch,
    )
    trainer.params = state["params"]

    loss, y_true, y_score, pids = trainer.run_epoch(
        batches, epoch=epoch, train=False
    )
    weights = _patient_weights(pids)
    return reports.device_epoch_report(
        y_true, y_score, weights,
        kfold=kfold, loss=loss, epoch=epoch, split=split,
    )
