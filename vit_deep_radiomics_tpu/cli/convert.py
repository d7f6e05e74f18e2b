"""CLI: checkpoint interchange with the reference's ``.pth`` format.

``to-pth`` turns a fold checkpoint trained here
(``model_epoch_NNNN.msgpack``) into a reference-named torch state dict —
drop it into the reference's ``models/...`` tree and its
``load_checkpoint`` (models_archs.py:22-35), UMAP and evaluation
scripts consume it unchanged.  The model family
(unimodal/bimodal transformer, conv) is inferred from the parameter
tree, no architecture flags needed::

    python -m vit_deep_radiomics_tpu convert to-pth \
        models/petct/medsam_transformer_stanford/ct/kfold_0/model_epoch_0007.msgpack \
        -o model_epoch_0007.pth
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert checkpoints to the reference .pth format")
    sub = p.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser(
        "to-pth", help="fold .msgpack checkpoint → reference .pth")
    ex.add_argument("checkpoint", help="model_epoch_NNNN.msgpack path")
    ex.add_argument("-o", "--out", required=True, help="output .pth path")
    return p


def _to_pth(args) -> int:
    import numpy as np
    import torch
    from flax import serialization

    from ..models.convert import classifier_params_to_torch

    with open(args.checkpoint, "rb") as fh:
        state = serialization.msgpack_restore(fh.read())
    params = state["params"] if "params" in state else state
    sd = classifier_params_to_torch(params)
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
               args.out)
    print(f"{args.out}: {len(sd)} tensors")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..core.distributed import claim_primary_entry

    if not claim_primary_entry("convert"):
        return 0  # multi-process launch: host job runs on the primary
    return {"to-pth": _to_pth}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
