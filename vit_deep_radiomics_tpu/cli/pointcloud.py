"""CLI: voxel point-cloud dataframe.

Mirrors /root/reference/src/create_pointcloud_dataframe.py over the
isotropic-HDF5 contract.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Build petct_pointcloud.parquet")
    p.add_argument("-h5", "--hdf5-path", required=True)
    p.add_argument("-df", "--df-path", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--datasets", nargs="*",
                   default=["stanford", "santa_maria"])
    args = p.parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("pointcloud"):
        return 0  # multi-process launch: host job runs on the primary

    import pandas as pd

    from ..analysis.pointcloud import build_pointcloud_parquet
    from ..data.synthetic import read_isotropic_hdf5

    df_meta = pd.read_csv(args.df_path)
    df_meta["label"] = (df_meta["egfr"] == "Mutant").astype(int)
    df_meta = df_meta[df_meta["dataset"].isin(args.datasets)]
    rows = [
        {"patient_id": r["patient_id"], "label": int(r["label"]),
         "dataset": r["dataset"], "modalities": ("pet", "ct")}
        for _, r in df_meta.iterrows()
        if r["label"] in (0, 1)
    ]

    def reader(pid, modality):
        return read_isotropic_hdf5(args.hdf5_path, pid, modality)

    output = args.output or os.path.join(
        os.path.dirname(args.df_path), "petct_pointcloud.parquet")
    out = build_pointcloud_parquet(reader, rows, output)
    print(f"wrote {output} ({len(out)} points)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
