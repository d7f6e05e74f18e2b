"""Run the reference trainer as a CPU oracle inside a sandbox project.

The reference (`/root/reference/src/train_models.py`, read-only) expects
a CUDA device and imports viz libraries this image does not ship
(plotly, skimage).  This runner executes it UNMODIFIED for the
end-to-end AUC-parity harness (tools/auc_parity.py) by:

* installing stub modules for plotly (its figures are write-only
  artifacts, irrelevant to AUC) and skimage.transform.resize (a real
  nearest-neighbour implementation — the trainer only calls it with
  order=0 on masks, train_models.py:151),
* rewriting ``cuda*`` devices to ``cpu`` in ``Tensor.to``/``Module.to``,
* seeding torch/numpy, chdir'ing into ``<project>/src`` so the
  reference's relative ``../data`` / ``../models`` paths and the
  ``.git``-based project-root discovery (config_manager.py:12-26)
  resolve inside the sandbox.

Usage: python tools/ref_oracle.py <project_dir> <ref_src_dir> [trainer args...]
"""

from __future__ import annotations

import os
import runpy
import sys
import types

import numpy as np


def _nearest_resize(image, output_shape, order=0, **_kw):
    """skimage.transform.resize stand-in (order-0 / identity cases)."""
    image = np.asarray(image)
    output_shape = tuple(int(n) for n in output_shape)
    if image.shape[: len(output_shape)] == output_shape:
        return image.copy()
    idx = [
        np.clip(
            ((np.arange(n) + 0.5) * image.shape[d] / n).astype(int),
            0, image.shape[d] - 1,
        )
        for d, n in enumerate(output_shape)
    ]
    out = image
    for d, ind in enumerate(idx):
        out = np.take(out, ind, axis=d)
    return out


def install_stubs() -> None:
    from unittest import mock

    for name in ("plotly", "plotly.graph_objs", "plotly.subplots"):
        sys.modules.setdefault(name, mock.MagicMock(name=name))
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        transform = types.ModuleType("skimage.transform")
        transform.resize = _nearest_resize
        skimage.transform = transform
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = transform


def patch_pandas1_compat() -> None:
    """Restore pandas-1.x integer positional Series access.

    The reference targets pandas 1.x (``row[0]`` inside
    prepare_df's apply, train_models.py:424); pandas 2 raises KeyError
    for integer keys on label-indexed Series.  Fall back to ``iloc``
    exactly as pandas 1 did.
    """
    import pandas as pd

    orig = pd.Series.__getitem__

    def getitem(self, key):
        try:
            return orig(self, key)
        except KeyError:
            if isinstance(key, int) and key not in self.index:
                return self.iloc[key]
            raise

    pd.Series.__getitem__ = getitem


def patch_torch_cpu() -> None:
    import torch

    def fix(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    mod_to = torch.nn.Module.to
    torch.nn.Module.to = lambda self, *a, **k: mod_to(
        self, *[fix(x) for x in a], **{kk: fix(v) for kk, v in k.items()}
    )
    ten_to = torch.Tensor.to

    def tensor_to(self, *a, **k):
        return ten_to(
            self, *[fix(x) for x in a], **{kk: fix(v) for kk, v in k.items()}
        )

    torch.Tensor.to = tensor_to


def main() -> None:
    project_dir, ref_src = sys.argv[1], sys.argv[2]
    trainer_args = sys.argv[3:]
    install_stubs()
    patch_pandas1_compat()
    patch_torch_cpu()
    import torch

    # VDR_ORACLE_SEED lets the parity harness measure the reference's
    # OWN run-to-run variance (intrinsic per-fold AUC jitter from init
    # + dropout + data-order draws) as the yardstick for |Δ| bands.
    seed = int(os.environ.get("VDR_ORACLE_SEED", "0"))
    torch.manual_seed(seed)
    np.random.seed(seed)
    os.chdir(os.path.join(project_dir, "src"))
    sys.path.insert(0, ref_src)
    sys.argv = ["train_models.py"] + trainer_args
    runpy.run_path(
        os.path.join(ref_src, "train_models.py"), run_name="__main__"
    )


if __name__ == "__main__":
    main()
