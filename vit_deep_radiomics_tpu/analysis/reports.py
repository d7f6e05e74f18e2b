"""Metric reports: per-epoch JSON + console rendering + HTML curves.

Keeps the reference's artifact contract (call sites train_models.py:744-798):

* per-epoch sklearn ``classification_report`` dicts with added
  ``ROC AUC`` / ``kfold`` / ``loss`` / ``epoch`` / ``split`` keys →
  ``{split}_metrics_{epoch}.json``,
* a human console rendering (:185-217 equivalent),
* ``losses.html`` loss/AUC/F1/target-metric curves.  plotly is not in
  this image, so the default renderer is a dependency-free inline-SVG
  writer producing the same 2×2 figure; if plotly is importable it is
  used instead (same call signature).
"""

from __future__ import annotations

import html
import json
import os
from pathlib import Path
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from sklearn.metrics import classification_report, roc_auc_score

__all__ = [
    "epoch_report",
    "device_epoch_report",
    "save_report_json",
    "format_report",
    "write_metrics_html",
]


def epoch_report(
    y_true: np.ndarray,
    y_score: np.ndarray,
    sample_weight: Sequence[float] | None,
    *,
    kfold,
    loss: float,
    epoch: int,
    split: str,
) -> dict:
    """Classification report dict, reference schema
    (train_models.py:747-763)."""
    y_pred = (np.asarray(y_score) >= 0.5).astype(int)
    report = classification_report(
        y_true, y_pred, output_dict=True, zero_division=0,
        sample_weight=sample_weight,
    )
    try:
        report["ROC AUC"] = float(
            roc_auc_score(y_true, y_score, sample_weight=sample_weight)
        )
    except ValueError:  # single-class split: AUC undefined
        report["ROC AUC"] = float("nan")
    report["kfold"] = kfold
    report["loss"] = float(loss)
    report["epoch"] = int(epoch)
    report["split"] = split
    return report


def device_epoch_report(
    y_true,
    y_score,
    sample_weight: Sequence[float] | None,
    *,
    kfold,
    loss: float,
    epoch: int,
    split: str,
) -> dict:
    """:func:`epoch_report` computed by the on-device metric kernels.

    The live trainer path (engine/train.py) uses this: weighted ROC-AUC
    (sort-based, tie-correct) and the confusion-count report run as one
    jitted program (ops/metrics.py), and the host receives only the
    final scalars — sklearn stays out of the hot loop and is only a
    cross-check in tests.  Output schema is identical to the sklearn
    ``classification_report`` dict of the reference
    (train_models.py:747-763): per-class precision/recall/f1-score/
    support, accuracy, macro/weighted averages, plus
    ``ROC AUC``/``kfold``/``loss``/``epoch``/``split``.
    """
    import jax.numpy as jnp

    from ..ops.metrics import binary_counts, binary_report_metrics, roc_auc

    yt = jnp.asarray(np.asarray(y_true), jnp.float32)
    ys = jnp.asarray(np.asarray(y_score), jnp.float32)
    w = None if sample_weight is None else jnp.asarray(
        np.asarray(sample_weight), jnp.float32)
    yp = (ys >= 0.5).astype(jnp.float32)
    m = binary_report_metrics(yt, yp, w)
    tp, fp, tn, fn = binary_counts(yt, yp, w)
    auc = roc_auc(yt, ys, w)
    # one host materialisation point for the whole epoch report
    vals = {k: float(v) for k, v in m.items()}
    tp, fp, tn, fn, auc = (float(x) for x in (tp, fp, tn, fn, auc))

    support_0 = tn + fp
    support_1 = tp + fn
    total = support_0 + support_1
    if support_0 == 0 or support_1 == 0:
        # sklearn raises on single-class y_true; epoch_report maps that
        # to nan — match it exactly
        auc = float("nan")

    def cls(prec, rec, f1, support):
        return {"precision": prec, "recall": rec, "f1-score": f1,
                "support": support}

    def avg(k0, k1, weights):
        w0, w1 = weights
        denom = w0 + w1
        if denom <= 0:
            return 0.0
        return (vals[k0] * w0 + vals[k1] * w1) / denom

    # sklearn's classification_report only includes classes present in
    # y_true ∪ y_pred and averages over THOSE (a degenerate single-class
    # split yields one class entry and macro over one class) — match it,
    # or the target metric AUC²·√macro_f1 diverges from the reference
    # trainer on such folds and flips checkpoint-gate decisions
    present = [
        c for c, seen in (
            ("0", support_0 > 0 or (tn + fn) > 0),
            ("1", support_1 > 0 or (tp + fp) > 0),
        ) if seen
    ]
    report = {
        c: cls(vals[f"precision_{c}"], vals[f"recall_{c}"],
               vals[f"f1_{c}"], (support_0, support_1)[int(c)])
        for c in present
    }
    n_present = max(1, len(present))
    report.update({
        "accuracy": vals["accuracy"],
        "macro avg": cls(
            sum(vals[f"precision_{c}"] for c in present) / n_present,
            sum(vals[f"recall_{c}"] for c in present) / n_present,
            sum(vals[f"f1_{c}"] for c in present) / n_present,
            total,
        ),
        "weighted avg": cls(
            avg("precision_0", "precision_1", (support_0, support_1)),
            avg("recall_0", "recall_1", (support_0, support_1)),
            avg("f1_0", "f1_1", (support_0, support_1)), total,
        ),
        "ROC AUC": auc,
        "kfold": kfold,
        "loss": float(loss),
        "epoch": int(epoch),
        "split": split,
    })
    return report


def save_report_json(report: Mapping, save_dir, split: str, epoch: int) -> str:
    """``{split}_metrics_{epoch}.json`` (train_models.py:769-773)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    path = save_dir / f"{split}_metrics_{epoch}.json"
    with open(path, "w") as fh:
        json.dump(dict(report), fh)
    return str(path)


def format_report(report: Mapping) -> str:
    """Console rendering of a report (train_models.py:185-217 analogue)."""
    lines = [
        f"split={report.get('split')} epoch={report.get('epoch')} "
        f"kfold={report.get('kfold')} loss={report.get('loss'):.4f} "
        f"AUC={report.get('ROC AUC'):.4f} "
        f"acc={report.get('accuracy', float('nan')):.4f}",
    ]
    for cls in ("0", "1"):
        if cls in report:
            r = report[cls]
            lines.append(
                f"  class {cls}: precision={r['precision']:.3f} "
                f"recall={r['recall']:.3f} f1={r['f1-score']:.3f} "
                f"support={r['support']:.1f}"
            )
    if "macro avg" in report:
        r = report["macro avg"]
        lines.append(f"  macro: f1={r['f1-score']:.3f}")
    return "\n".join(lines)


# -- HTML curves --------------------------------------------------------------

_SVG_W, _SVG_H, _PAD = 460, 260, 40
_COLORS = {"train": "#d62728", "test": "#1f77b4", "single": "#2ca02c"}


def _svg_panel(title: str, series: dict[str, tuple[list, list]]) -> str:
    """One SVG line chart; series: name → (xs, ys)."""
    all_y = [y for _, ys in series.values() for y in ys if np.isfinite(y)]
    all_x = [x for xs, _ in series.values() for x in xs]
    if not all_y:
        return ""
    ymin, ymax = min(all_y), max(all_y)
    if ymax == ymin:
        ymax = ymin + 1e-9
    xmin, xmax = min(all_x), max(all_x)
    if xmax == xmin:
        xmax = xmin + 1

    def sx(x):
        return _PAD + (x - xmin) / (xmax - xmin) * (_SVG_W - 2 * _PAD)

    def sy(y):
        return _SVG_H - _PAD - (y - ymin) / (ymax - ymin) * (_SVG_H - 2 * _PAD)

    parts = [
        f'<svg width="{_SVG_W}" height="{_SVG_H}" '
        f'style="background:#fff;border:1px solid #ddd">',
        f'<text x="{_SVG_W/2}" y="16" text-anchor="middle" '
        f'font-size="13" font-family="sans-serif">{html.escape(title)}</text>',
        f'<text x="6" y="{_PAD}" font-size="10" font-family="monospace">'
        f"{ymax:.3g}</text>",
        f'<text x="6" y="{_SVG_H - _PAD}" font-size="10" '
        f'font-family="monospace">{ymin:.3g}</text>',
    ]
    for li, (name, (xs, ys)) in enumerate(series.items()):
        color = _COLORS.get(name.split("_")[0], "#555")
        pts = " ".join(
            f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys)
            if np.isfinite(y)
        )
        parts.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>'
        )
        parts.append(
            f'<text x="{_PAD}" y="{28 + 12 * li}" font-size="10" '
            f'fill="{color}" font-family="sans-serif">{html.escape(name)}'
            f"</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def write_metrics_html(
    df_loss: pd.DataFrame, path: str | os.PathLike, title: str
) -> str:
    """Loss/AUC/F1/target-metric 2×2 figure → standalone HTML.

    Same panel layout as the reference's plotly figure
    (train_models.py:220-264); uses plotly when available, otherwise the
    built-in SVG renderer (plotly is absent from this image).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import plotly  # noqa: F401

        return _write_plotly(df_loss, path, title)
    except ImportError:
        pass

    metric_names = ["loss", "auc", "f1", "target_metric"]
    panels = []
    xs = df_loss["epoch"].tolist()
    for name in metric_names:
        series = {}
        if f"train_{name}" in df_loss.columns:
            series[f"train_{name}"] = (xs, df_loss[f"train_{name}"].tolist())
            series[f"test_{name}"] = (xs, df_loss[f"test_{name}"].tolist())
        elif name in df_loss.columns:
            series["single"] = (xs, df_loss[name].tolist())
        if series:
            panels.append(_svg_panel(name.upper(), series))
    body = "".join(panels)
    doc = (
        f"<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h2 style='font-family:sans-serif'>{html.escape(title)}</h2>"
        f"{body}</body></html>"
    )
    with open(path, "w") as fh:
        fh.write(doc)
    return str(path)


def _write_plotly(df_loss, path, title):
    import plotly.graph_objs as go
    from plotly.subplots import make_subplots

    names = ["loss", "auc", "f1", "target_metric"]
    grid = [(1, 1), (1, 2), (2, 1), (2, 2)]
    fig = make_subplots(rows=2, cols=2, shared_xaxes=True,
                        subplot_titles=[n.upper() for n in names])
    for (r, c), name in zip(grid, names):
        if f"train_{name}" in df_loss.columns:
            for split, color in (("train", "red"), ("test", "blue")):
                fig.append_trace(
                    go.Scatter(x=df_loss["epoch"],
                               y=df_loss[f"{split}_{name}"],
                               mode="lines+markers", marker_color=color,
                               name=f"{split}_{name}"),
                    row=r, col=c,
                )
        elif name in df_loss.columns:
            fig.append_trace(
                go.Scatter(x=df_loss["epoch"], y=df_loss[name],
                           mode="lines+markers", marker_color="green",
                           name=name),
                row=r, col=c,
            )
    fig.update_layout(title_text=title, xaxis_title="Epochs")
    fig.write_html(str(path))
    return str(path)
