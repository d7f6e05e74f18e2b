"""Patient-stratified k-fold splits → generated YAML config.

Capability-equivalent of /root/reference/src/split_patients.py:15-43:
per (modality × dataset), a StratifiedKFold(n_splits=5, shuffle=True,
random_state=42) over patient-level first labels, written to
``conf/parameters_kfold.yaml`` under the ``kfold_patients`` key so the
config loader picks it up (same generated-config contract).
"""

from __future__ import annotations

import os
from typing import Mapping

import pandas as pd
from sklearn.model_selection import StratifiedKFold

from ..utils.config import save_yaml

__all__ = ["build_kfold_patients", "write_kfold_yaml"]


def build_kfold_patients(
    df: pd.DataFrame,
    n_splits: int = 5,
    seed: int = 42,
) -> dict:
    """``{modality: {dataset: {fold: {'train': [...], 'test': [...]}}}}``.

    Patient labels are the per-patient first label (split_patients.py:27-29);
    shuffle+seed match the reference so identical metadata yields identical
    folds.
    """
    kfold_patients: dict = {}
    for modality in df["modality"].unique():
        skf = StratifiedKFold(n_splits=n_splits, shuffle=True,
                              random_state=seed)
        dfm = df[df["modality"] == modality].reset_index(drop=True)
        kfold_patients[modality] = {}
        for dataset in dfm["dataset"].unique():
            patients_labels = (
                dfm[dfm["dataset"] == dataset]
                .groupby("patient_id")["label"].first()
            )
            patients = patients_labels.index.to_list()
            labels = patients_labels.to_list()
            folds = {}
            for k, (train_idx, test_idx) in enumerate(
                skf.split(patients, labels)
            ):
                folds[k] = {
                    "train": [patients[i] for i in train_idx],
                    "test": [patients[i] for i in test_idx],
                }
            kfold_patients[modality][dataset] = folds
    return kfold_patients


def write_kfold_yaml(
    kfold_patients: Mapping, conf_dir: str | os.PathLike
) -> str:
    path = os.path.join(conf_dir, "parameters_kfold.yaml")
    save_yaml({"kfold_patients": dict(kfold_patients)}, path)
    return path
