"""CLI: ROC curves + late-fusion embedding classifier.

Mirrors /root/reference/src/embedding_classifier.py over the
``petct_embeddings_umap.parquet`` produced by cli/umap_embed.py.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="ROC curves + patient-level PET/CT late fusion")
    p.add_argument("--embeddings", default=os.path.join(
        "data", "petct_embeddings_umap.parquet"))
    p.add_argument("--dataset", default="santa_maria")
    p.add_argument("--arch", default="transformer")
    p.add_argument("--roc-out", default="ROC Curve.html")
    p.add_argument("--report-out", default=None,
                   help="write fold reports JSON here (default: print)")
    p.add_argument("--n-splits", type=int, default=5)
    args = p.parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("fusion"):
        return 0  # multi-process launch: host job runs on the primary

    import numpy as np
    import pandas as pd

    from ..analysis.fusion import late_fusion_cv, roc_table, write_roc_html

    df = pd.read_parquet(args.embeddings)
    df["embedding"] = df["embedding"].map(np.asarray)

    roc = roc_table(df)
    if len(roc):
        write_roc_html(roc, args.roc_out)
        print(f"wrote {args.roc_out}")

    try:
        results = late_fusion_cv(
            df, args.dataset, args.arch, n_splits=args.n_splits)
    except ValueError as exc:
        print(f"late fusion skipped: {exc}")
        return 0
    for r in results:
        rep = r["report"]
        print(
            f"fold {r['kfold']}: fusion acc={rep['accuracy']:.3f} "
            f"macro-f1={rep['macro avg']['f1-score']:.3f} | "
            f"end-to-end acc={r['baseline_report']['accuracy']:.3f}"
        )
    if args.report_out:
        with open(args.report_out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.report_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
