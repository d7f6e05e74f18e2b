"""Synthetic PET/CT volumes: test fixtures and end-to-end smoke data.

The reference has no fixtures at all (SURVEY.md §4); these generators
produce volumes with the same shape/semantics as its ingestion layer —
HU-valued CT, liver-normalised-style PET, blob nodule masks, per-exam
spatial resolution — plus an on-disk writer using the isotropic-HDF5
contract the reference reads (``{pid}_{modality}/img_exam/{k}`` /
``mask_exam/{k}``, /root/reference/src/tfds_dense_descriptor.py:353-362)
so the extraction engine can be driven exactly like the real pipeline.
"""

from __future__ import annotations

import os
from pathlib import Path

import h5py
import numpy as np

__all__ = [
    "synthetic_volume",
    "synthetic_cohort",
    "write_isotropic_hdf5",
    "read_isotropic_hdf5",
    "write_synthetic_feature_store",
]


def synthetic_volume(
    rng: np.random.Generator,
    height: int = 96,
    width: int = 96,
    slices: int = 8,
    modality: str = "ct",
    nodule_radius: int = 6,
):
    """One (H, W, S) volume + boolean nodule mask + spatial resolution.

    CT voxels are HU-like (air/lung body with a soft-tissue nodule);
    PET voxels are nonnegative uptake values with a hot nodule.
    """
    h, w, s = height, width, slices
    if modality == "ct":
        vol = rng.normal(-750, 150, size=(h, w, s)).astype(np.float32)
    else:
        vol = np.abs(rng.normal(0.5, 0.3, size=(h, w, s))).astype(np.float32)

    cy = int(rng.integers(h // 4, 3 * h // 4))
    cx = int(rng.integers(w // 4, 3 * w // 4))
    cz = s // 2
    yy, xx, zz = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(s), indexing="ij"
    )
    r2 = ((yy - cy) ** 2 + (xx - cx) ** 2
          + ((zz - cz) * 2) ** 2)
    mask = r2 <= nodule_radius ** 2
    if modality == "ct":
        vol[mask] = rng.normal(35, 10, size=int(mask.sum())).astype(np.float32)
    else:
        vol[mask] += 3.0
    spatial_res = np.asarray([0.8, 0.8, 0.8], np.float64)
    return vol, mask, spatial_res


def synthetic_cohort(
    n_patients: int = 4,
    seed: int = 0,
    dataset: str = "stanford",
    modalities=("ct", "pet"),
    height: int = 96,
    width: int = 96,
    ct_slices: int = 8,
    pet_slices: int = 4,
):
    """Dict cohort: {pid: {'label': int, modality: (vol, mask, res)}}."""
    rng = np.random.default_rng(seed)
    cohort = {}
    for i in range(n_patients):
        pid = f"{dataset}_{i:03d}"
        label = i % 2  # balanced, deterministic labels
        entry = {"label": label, "dataset": dataset}
        for modality in modalities:
            s = ct_slices if modality in ("ct", "chest") else pet_slices
            entry[modality] = synthetic_volume(
                rng, height, width, s, modality=modality
            )
        cohort[pid] = entry
    return cohort


def write_isotropic_hdf5(
    cohort: dict, hdf5_path: str | os.PathLike, csv_path: str | os.PathLike
) -> None:
    """Persist a cohort in the reference's isotropic-HDF5 + CSV contract.

    HDF5: per-slice datasets ``{pid}_{modality}/img_exam/{k}`` and
    ``mask_exam/{k}`` (tfds_dense_descriptor.py:353-362); CSV metadata
    with patient_id / egfr / dataset / has_<modalities> columns
    (:396-400).
    """
    import pandas as pd

    Path(hdf5_path).parent.mkdir(parents=True, exist_ok=True)
    rows = []
    with h5py.File(hdf5_path, "w") as h5f:
        for pid, entry in cohort.items():
            for modality in ("ct", "pet", "chest"):
                if modality not in entry:
                    continue
                vol, mask, _res = entry[modality]
                grp = h5f.create_group(f"{pid}_{modality}")
                for k in range(vol.shape[2]):
                    grp.create_dataset(f"img_exam/{k}", data=vol[:, :, k])
                    grp.create_dataset(f"mask_exam/{k}", data=mask[:, :, k])
            rows.append({
                "patient_id": pid,
                "egfr": "Mutant" if entry["label"] else "Wildtype",
                "dataset": entry["dataset"],
                "has_petct": "ct" in entry and "pet" in entry,
                "has_petchest": "chest" in entry and "pet" in entry,
            })
    pd.DataFrame(rows).to_csv(csv_path, index=False)


def write_synthetic_feature_store(
    feature_dir: str | os.PathLike,
    n_patients: int = 20,
    ct_slices: int = 16,
    pet_slices: int = 4,
    grid: int = 12,
    mask_extent: int = 6,
    feat_dim: int = 32,
    signal: float = 1.2,
    seed: int = 0,
    dataset: str = "stanford",
    twins: tuple[tuple[int, int], ...] = (),
    alphas: dict[int, float] | None = None,
) -> "pd.DataFrame":
    """Descriptor-level synthetic cohort with a planted class signal.

    Writes the full downstream-training artifact set in the reference
    contract — ``features_masks_{ct,pet}.hdf5`` (groups
    ``{pid}/features/{i}`` / ``masks/{i}``,
    tfds_dense_descriptor.py:142-165), per-patient metadata parquets and
    the merged ``petct.parquet`` (merge_dataframe_features.py:17-30) —
    so BOTH the reference trainer and this framework's trainer can
    consume identical files (the end-to-end AUC-parity harness,
    tools/auc_parity.py).

    Each masked voxel's descriptor is iid N(0,1) noise plus
    ``(2·label−1)·signal·u`` along a fixed unit direction ``u``, so the
    task is learnable and both trainers converge to the same AUC.

    ``twins`` lists patient index pairs ``(i, j)`` (must have opposite
    labels, i.e. ``i + j`` odd) that share EXACT-COPY features and
    masks, generated once with a *mid-strength* shift
    ``twin_alpha·signal·u`` instead of either label's full shift.  A
    deterministic model scores identical inputs identically, so each
    twin pair is a forced tie in the ROC ranking: the Bayes-optimal
    weighted AUC is capped strictly below 1.0 by the same amount for
    ANY converged classifier.  The mid-strength signal matters: it pins
    the pair's common score INSIDE the margin between the two confident
    clusters, so every twin-vs-nontwin ordering is robust and only the
    exact intra-pair tie costs AUC — identically for both trainers.
    (Copying one twin's full-strength features instead puts the
    opposite-label twin's score inside the wrong cluster, where
    orderings vs. same-scored patients flip with trainer-specific
    rounding — measured breaking 0.5% parity.)  The k-fold AUC-parity
    harness (tools/auc_parity.py) uses this to compare non-trivial,
    data-limited AUCs instead of a vacuous 1.0 == 1.0.

    ``alphas`` overrides the per-patient signal multiplier (default
    ``2·label−1``).  Setting a patient's alpha to the *opposite* class
    value (``-(2·label−1)``) plants feature-level label noise: the
    patient's descriptors are distributionally identical to the other
    cluster, so no classifier can separate it from that cluster on held
    -out data — its ROC pairs against same-cluster opposite-label
    patients resolve by the *realized* window-noise ordering, which is
    fixed by ``seed`` (data-determined), not by the trainer.  The
    stochastic AUC-parity regime (tools/auc_parity.py) uses this for
    mid-range, fold-varying AUCs that both trainers must track.
    Returns the merged metadata dataframe.
    """
    import pandas as pd

    from .feature_store import (
        merge_metadata,
        save_features,
        slice_metadata_frame,
    )

    feature_dir = Path(feature_dir)
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(feat_dim,))
    u /= np.linalg.norm(u)
    lo = (grid - mask_extent) // 2
    mask = np.zeros((grid, grid), bool)
    mask[lo:lo + mask_extent, lo:lo + mask_extent] = True
    spatial_res = np.asarray([0.8, 0.8, 0.8], np.float64)

    twin_of = {}
    for i, j in twins:
        if (i + j) % 2 == 0:
            raise ValueError(
                f"twin pair {(i, j)} must have opposite labels"
            )
        if not 0 <= i < j < n_patients:
            raise ValueError(f"twin pair {(i, j)} needs 0 <= i < j < n")
        twin_of[j] = i
    twin_firsts = set(twin_of.values())
    twin_alpha = 0.4  # mid-margin: between the ±signal clusters

    ds_dir = feature_dir / f"{dataset}_dataset"
    ds_dir.mkdir(parents=True, exist_ok=True)
    stored: dict[tuple[int, str], tuple[list, list]] = {}
    for i in range(n_patients):
        pid = f"{dataset[:2]}_{i:03d}"
        label = i % 2
        if i in twin_firsts:
            alpha = twin_alpha
        elif alphas is not None and i in alphas:
            alpha = float(alphas[i])
        else:
            alpha = float(2 * label - 1)
        shift = alpha * signal * u
        for modality, n_slices in (("ct", ct_slices), ("pet", pet_slices)):
            if i in twin_of:
                feats, masks = stored[(twin_of[i], modality)]
            else:
                feats, masks = [], []
                for _s in range(n_slices):
                    f = rng.normal(size=(grid, grid, feat_dim)).astype(
                        np.float32)
                    f[mask] += shift.astype(np.float32)
                    feats.append(f)
                    masks.append(mask)
            stored[(i, modality)] = (feats, masks)
            save_features(
                feature_dir / f"features_masks_{modality}.hdf5",
                feats, masks, pid,
            )
            meta = slice_metadata_frame(
                slices=range(n_slices),
                angles=[0] * n_slices,
                flips=["None"] * n_slices,
                patient_id=pid, label=label, dataset=dataset,
                modality=modality, spatial_res=spatial_res,
            )
            meta.to_parquet(ds_dir / f"{pid}_{modality}.parquet")
    return merge_metadata(
        feature_dir, datasets=(f"{dataset}_dataset",),
        output_path=feature_dir / "petct.parquet",
    )


def read_isotropic_hdf5(
    hdf5_path: str | os.PathLike, patient_id: str, modality: str,
    isotropic_scale: float = 0.8,
):
    """(volume, mask, spatial_res) from the isotropic store.

    Parity with reference ``get_voxels`` (tfds_dense_descriptor.py:353-362)
    including the hardcoded isotropic resolution.
    """
    spatial_res = np.asarray([isotropic_scale] * 3, np.float64)
    with h5py.File(hdf5_path, "r") as h5f:
        idm = f"{patient_id}_{modality}"
        keys = sorted(int(k) for k in h5f[f"{idm}/img_exam"].keys())
        img = np.dstack([h5f[f"{idm}/img_exam/{k}"][()] for k in keys])
        mask = np.dstack([h5f[f"{idm}/mask_exam/{k}"][()] for k in keys])
    return img, mask, spatial_res
