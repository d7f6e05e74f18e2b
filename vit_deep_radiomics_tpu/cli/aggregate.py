"""CLI: aggregate k-fold metrics → summary CSV.

Mirrors /root/reference/src/avg_kfold_metrics.py.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Aggregate k-fold metric JSONs")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--metrics-dir", default="metrics")
    p.add_argument("--folder", default="petct",
                   help="experiment folder under models/")
    p.add_argument("--plots-dir", default="plots")
    args = p.parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("aggregate"):
        return 0  # multi-process launch: host job runs on the primary

    from ..analysis.aggregate import aggregate_experiments

    out = aggregate_experiments(args.models_dir, args.metrics_dir,
                                folder=args.folder,
                                plots_dir=args.plots_dir)
    print(out.round(3).T)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
