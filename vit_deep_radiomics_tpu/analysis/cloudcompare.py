"""CloudCompare / Sketchfab point-cloud exports.

Capability-equivalent of /root/reference/src/visualize_point_clouds.py:

* grid-layout per-patient exports (one ``.txt`` per patient/modality,
  x/y/z/grey columns, patients offset on a square grid, :15-27),
* UMAP-positioned cohort export: each patient's cloud translated to its
  3D UMAP coordinate, scaled so the closest pair does not overlap,
  ``.txt`` (CloudCompare) or ``.asc`` (Sketchfab) output (:30-60),
* the O(N²) pairwise-distance helper (:63-68) — vectorised.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd

__all__ = [
    "pairwise_distances",
    "export_to_cloud_compare",
    "export_umap_to_cloud_compare",
]


def pairwise_distances(points: np.ndarray) -> np.ndarray:
    """Dense pairwise Euclidean distances, diagonal = inf (:63-68)."""
    diff = points[:, None, :] - points[None, :, :]
    d = np.sqrt(np.sum(diff ** 2, axis=-1))
    np.fill_diagonal(d, np.inf)
    return d


def export_to_cloud_compare(
    df: pd.DataFrame,
    patients: pd.DataFrame,
    out_dir: str | os.PathLike,
    offset: float = 100.0,
) -> list[str]:
    """Per-patient x/y/z/grey ``.txt`` files laid out on a grid (:15-27).

    ``df`` needs columns x/y/z/grey/modality/patient_id; ``patients``
    needs patient_id/label rows (grid position = row order, shifted by
    label like the reference).
    """
    out_dir = Path(out_dir)
    nrows = int(np.sqrt(len(patients))) + 1
    written = []
    for i, row in patients.reset_index(drop=True).iterrows():
        pid, label = row["patient_id"], row["label"]
        sub = df[df["patient_id"] == pid][
            ["x", "y", "z", "grey", "modality"]].copy()
        sub["x"] += (i // nrows) * offset + label * offset
        sub["y"] += (i % nrows) * offset
        for modality in sub["modality"].unique():
            path = out_dir / modality / f"{pid}_{label}.txt"
            path.parent.mkdir(parents=True, exist_ok=True)
            sub[sub["modality"] == modality][
                ["x", "y", "z", "grey"]].to_csv(path, sep=" ", index=False)
            written.append(str(path))
    return written


def export_umap_to_cloud_compare(
    df: pd.DataFrame,
    df_umap: pd.DataFrame,
    out_path: str | os.PathLike,
    modality: str = "ct",
    offset: float = 10.0,
    use_2d: bool = False,
    to_sketchfab: bool = False,
) -> str:
    """Place each patient's cloud at its (scaled) UMAP coordinate (:30-60).

    ``df_umap`` needs patient_id + umap_x/y/z columns; scaling ensures the
    closest patient pair sits ``offset`` apart.
    """
    df_umap = df_umap.groupby("patient_id").mean(numeric_only=True)
    if use_2d:
        # project the UMAP coordinates only — the patient-mean frame also
        # carries y_true/y_pred/y_score columns, which must not leak
        # label information into the spatial layout
        vals = df_umap[["umap_x", "umap_y", "umap_z"]].to_numpy()
        centered = vals - vals.mean(axis=0)
        _u, _s, vt = np.linalg.svd(centered, full_matrices=False)
        df_umap[["x", "y"]] = centered @ vt[:2].T
        df_umap["z"] = 0.0
    else:
        df_umap[["x", "y", "z"]] = df_umap[["umap_x", "umap_y", "umap_z"]]

    d = pairwise_distances(df_umap[["x", "y", "z"]].to_numpy())
    min_distance = d.min()
    if np.isfinite(min_distance) and min_distance > 0:
        df_umap[["x", "y", "z"]] *= offset / min_distance
    df_umap = df_umap.sort_index()

    sub = df[df["modality"] == modality].set_index("patient_id").sort_index()
    for coord in ("x", "y", "z"):
        sub[coord] = sub[coord] + df_umap[coord]

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if to_sketchfab:
        sub[["x", "y", "z", "grey", "grey", "grey"]].astype(int).to_csv(
            out_path, sep=" ", index=False, header=False)
    else:
        cols = ["x", "y", "z", "grey", "label"]
        if "is_test" in sub.columns:
            cols.append("is_test")
        sub[cols].to_csv(out_path, sep=" ", index=False)
    return str(out_path)
