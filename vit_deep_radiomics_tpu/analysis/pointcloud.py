"""Voxel point-cloud dataframes, computed on device.

Capability-equivalent of /root/reference/src/create_pointcloud_dataframe.py:
per patient/modality volume, a table of voxel physical coordinates
(x, y, z in mm), raw and normalised intensities, mask membership and
nodule-bbox membership, centred on the nodule box — but the meshgrid,
bbox test, normalisation and centring all run as one jitted program; the
host only receives the final filtered columns.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..ops import preprocess as pp

__all__ = ["pointcloud_arrays", "to_pointcloud_df", "build_pointcloud_parquet"]


@functools.partial(jax.jit, static_argnames=("modality",))
def _pointcloud_device(img, mask, spatial_res, modality: str):
    h, w, s = img.shape
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        jnp.arange(s, dtype=jnp.float32),
        indexing="ij",
    )
    # reference coordinate convention (create_pointcloud_dataframe.py:16-22,
    # np.meshgrid 'xy' indexing): x = column index · res₀, y = row · res₁
    x = jj * spatial_res[0]
    y = ii * spatial_res[1]
    z = kk * spatial_res[2]

    m = mask > 0
    big = jnp.float32(1e30)
    # nodule bbox in physical coords (mask_box, :26-30)
    def bound(coord, reduce_min):
        masked = jnp.where(m, coord, big if reduce_min else -big)
        return jnp.min(masked) if reduce_min else jnp.max(masked)

    in_box = jnp.ones_like(m)
    for coord in (x, y, z):
        lo = bound(coord, True)
        hi = bound(coord, False)
        in_box = in_box & (coord >= lo) & (coord <= hi)

    if modality in ("ct", "chest"):
        norm = pp.apply_window_ct(img, 800, 40)
    else:
        norm = pp.normalize_pet(img)

    return x, y, z, norm, in_box


def pointcloud_arrays(img, mask, spatial_res, modality: str):
    """Device pass → host dict of flat arrays (mask_box rows only,
    xyz centred — :78-81)."""
    x, y, z, norm, in_box = _pointcloud_device(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(mask, jnp.float32),
        jnp.asarray(spatial_res, jnp.float32),
        modality,
    )
    sel = np.asarray(in_box).reshape(-1)
    cols = {
        "x": np.asarray(x).reshape(-1)[sel],
        "y": np.asarray(y).reshape(-1)[sel],
        "z": np.asarray(z).reshape(-1)[sel],
        "raw": np.asarray(img).reshape(-1)[sel],
        "mask": np.asarray(mask).reshape(-1)[sel],
        "norm": np.asarray(norm).reshape(-1)[sel],
    }
    for c in ("x", "y", "z"):
        cols[c] = cols[c] - cols[c].mean()
    return cols


def to_pointcloud_df(
    img, mask, label, spatial_res, modality="ct",
    patient_id="", dataset="",
) -> pd.DataFrame:
    """One patient/modality point-cloud dataframe (reference row schema)."""
    cols = pointcloud_arrays(img, mask, spatial_res, modality)
    df = pd.DataFrame(cols)
    df["mask_box"] = True
    df["modality"] = modality
    df["dataset"] = dataset
    df["patient_id"] = patient_id
    df["label"] = label
    return df


def build_pointcloud_parquet(
    cohort_reader, patient_rows, output_path
) -> pd.DataFrame:
    """Sweep (patient, modality) pairs → ``petct_pointcloud.parquet``.

    ``cohort_reader(pid, modality)`` must return (img, mask, spatial_res);
    ``patient_rows`` is an iterable of dicts with patient_id / label /
    dataset / modalities.
    """
    dfs = []
    for row in patient_rows:
        for modality in row.get("modalities", ("pet", "ct")):
            img, mask, res = cohort_reader(row["patient_id"], modality)
            if not (np.asarray(mask) > 0).any():
                continue
            dfs.append(to_pointcloud_df(
                img, mask, row["label"], res, modality,
                patient_id=row["patient_id"], dataset=row["dataset"],
            ))
    out = pd.concat(dfs).reset_index(drop=True)
    out.to_parquet(output_path)
    return out
