"""Best-model CLS-embedding extraction + 3D projection.

Capability-equivalent of /root/reference/src/umap_cls_token.py (which is
stale upstream — it imports a nonexistent module and an outdated dataset
signature, :15-20, 110-115; rebuilt here against the live trainer):

* pick each experiment's best (fold, epoch) from the aggregation summary
  CSV,
* restore that checkpoint, run deterministic inference over the dataset
  collecting (y_true, y_score, CLS embedding),
* project embeddings to 3D — UMAP(n_neighbors=3, min_dist=0.5, seed 42)
  when umap-learn is importable, otherwise a PCA fallback (umap-learn is
  not in this image),
* write the 3D scatter HTML and ``petct_embeddings_umap.parquet``
  (:158-166 contract).
"""

from __future__ import annotations

import html
from pathlib import Path

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..data.datasets import PETCTDataset, batch_items, prepare_windows
from ..engine import checkpoint as ckpt
from ..engine.train import FoldTrainer, TrainerConfig

__all__ = [
    "best_fold_epoch_from_summary",
    "project_3d",
    "extract_embeddings",
    "write_scatter3d_html",
]


def best_fold_epoch_from_summary(
    summary_csv, dataset: str, modality: str, arch: str
) -> tuple[int, int]:
    """(best kfold, best epoch) for an experiment from the summary CSV
    (umap_cls_token.py:68-73 semantics)."""
    df = pd.read_csv(summary_csv)
    df = df[df["Dataset"].str.contains(dataset.replace("_", " "))]
    df = df[df["Modality"] == modality]
    df = df[df["Model"].str.contains(arch)]
    if df.empty:
        raise ValueError(
            f"no summary rows for {dataset}/{modality}/{arch}"
        )
    row = df.iloc[0]
    return int(row["Best Kfold"]), int(row["Best Epoch"])


def project_3d(
    embeddings: np.ndarray, seed: int = 42
) -> tuple[np.ndarray, str]:
    """3D projection → (coords, projector name).

    Reference parameters (umap_cls_token.py:141): UMAP(n_neighbors=3,
    min_dist=0.5, n_components=3, seed, metric='l2', n_epochs=500).
    umap-learn is used when importable; otherwise the vendored minimal
    UMAP (analysis/umap_minimal.py) runs the same algorithm — the
    artifact is a real UMAP either way, and the returned name
    ('umap' | 'umap-minimal') is recorded in the parquet/HTML so the
    projector is never ambiguous (round-1 gap)."""
    try:
        from umap.umap_ import UMAP

        um = UMAP(n_neighbors=3, min_dist=0.5, n_components=3,
                  random_state=seed, metric="l2", n_epochs=500)
        return np.asarray(um.fit_transform(embeddings)), "umap"
    except ImportError:
        from .umap_minimal import umap_project

        return (
            umap_project(
                embeddings, n_components=3, n_neighbors=3, min_dist=0.5,
                n_epochs=500, random_state=seed,
            ),
            "umap-minimal",
        )


def extract_embeddings(
    df: pd.DataFrame,
    cfg: dict,
    tcfg: TrainerConfig,
    hdf5_ct_path,
    hdf5_pet_path,
    fold_dir,
    epoch: int,
) -> pd.DataFrame:
    """Deterministic inference with a restored checkpoint →
    (patient_id_new, y_true, y_pred, y_score, embedding) frame."""
    # mirror train_kfold's modality/window handling (train.py::train_kfold)
    # so chest-modality and whole-volume checkpoints embed the token sets
    # they trained on
    modality_a = "pet"
    modality_b = "chest" if "chest" in tcfg.modality else "ct"
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
    batches = list(batch_items(items, tcfg.batch_size))
    if not batches:
        raise ValueError(
            f"no embeddable windows for modality '{tcfg.modality}' — the "
            "frame has no rows for its modalities")
    trainer.init_params(batches[0])
    state = ckpt.load_checkpoint(
        {"params": trainer.params, "opt_state": trainer.opt_state,
         "epoch": 0},
        fold_dir, epoch,
    )
    trainer.params = state["params"]

    @jax.jit
    def _apply(params, args, kwargs):
        outputs = trainer.model.apply(
            params, *args, deterministic=True, **kwargs
        )
        return outputs[0].astype(jnp.float32), outputs[1].astype(jnp.float32)

    # jitted forward, all batches dispatched before any pull (async
    # dispatch pipelines the device; one materialisation pass at the end)
    dev_outs = []
    for batch in batches:
        args, kwargs = trainer._model_inputs(batch, deterministic=True)
        kwargs.pop("deterministic", None)
        dev_outs.append(_apply(trainer.params, args, kwargs))

    rows = []
    for batch, (logits_d, embeds_d) in zip(batches, dev_outs):
        logits = np.asarray(logits_d)
        embeds = np.asarray(embeds_d)
        lg = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(lg)
        probs = e / e.sum(axis=-1, keepdims=True)
        for i, pid in enumerate(batch["patient_ids"]):
            rows.append({
                "patient_id": pid,
                "y_true": int(np.argmax(batch["labels"][i])),
                "y_score": float(probs[i, 1]),
                "y_pred": int(probs[i, 1] > 0.5),
                "embedding": embeds[i],
            })
    return pd.DataFrame(rows)


def write_scatter3d_html(df_umap: pd.DataFrame, path, title: str) -> str:
    """3D scatter → HTML.  plotly when importable; otherwise a simple SVG
    orthographic projection (colour by y_true)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import plotly.express as px

        fig = px.scatter_3d(
            df_umap, x="umap_x", y="umap_y", z="umap_z",
            color=df_umap["y_true"].astype(str), title=title,
        )
        fig.write_html(str(path))
        return str(path)
    except ImportError:
        pass

    w = h = 420
    xs = df_umap["umap_x"].to_numpy()
    ys = df_umap["umap_y"].to_numpy()
    zs = df_umap["umap_z"].to_numpy()
    # orthographic: screen x = x + 0.4 z, screen y = y + 0.25 z
    px_ = xs + 0.4 * zs
    py_ = ys + 0.25 * zs

    def scale(v, size):
        lo, hi = v.min(), v.max()
        rng = (hi - lo) or 1.0
        return 20 + (v - lo) / rng * (size - 40)

    sx, sy = scale(px_, w), scale(py_, h)
    colors = {0: "#1f77b4", 1: "#d62728"}
    dots = "".join(
        f'<circle cx="{x:.1f}" cy="{h - y:.1f}" r="4" '
        f'fill="{colors.get(int(t), "#999")}" fill-opacity="0.75"/>'
        for x, y, t in zip(sx, sy, df_umap["y_true"])
    )
    doc = (
        f"<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h3 style='font-family:sans-serif'>{html.escape(title)}</h3>"
        f'<svg width="{w}" height="{h}" '
        f'style="background:#fff;border:1px solid #ddd">{dots}</svg>'
        f"<p style='font-family:sans-serif;font-size:12px'>"
        f"blue: class 0 · red: class 1 (orthographic projection)</p>"
        f"</body></html>"
    )
    with open(path, "w") as fh:
        fh.write(doc)
    return str(path)
