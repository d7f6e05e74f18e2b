"""Late-fusion embedding classifier + ROC curve artifacts.

Capability-equivalent of /root/reference/src/embedding_classifier.py:

* ROC curves (with per-threshold F1) for every (dataset, modality, arch)
  group of the embeddings parquet → HTML (:36-64),
* patient-level mean PET/CT embeddings concatenated into a late-fusion
  feature vector, 5-fold stratified CV with sklearn
  ``MLPClassifier(hidden=(512,), solver='lbfgs', activation='logistic')``
  (:69-116), returning the per-fold classification reports instead of
  printing them.
"""

from __future__ import annotations

import html as html_mod
from pathlib import Path

import numpy as np
import pandas as pd
from sklearn.metrics import (
    classification_report,
    f1_score,
    roc_auc_score,
    roc_curve,
)
from sklearn.model_selection import StratifiedKFold
from sklearn.neural_network import MLPClassifier

__all__ = ["roc_table", "write_roc_html", "late_fusion_cv"]


def roc_table(df: pd.DataFrame) -> pd.DataFrame:
    """Per-model ROC points with thresholds and per-threshold F1
    (embedding_classifier.py:36-55 schema)."""
    rows = []
    grouped = df.set_index(["dataset", "modality", "arch"])
    for key in grouped.index.unique():
        sub = grouped.loc[[key]]
        y_true = sub["y_true"].astype(int).to_numpy()
        y_score = sub["y_score"].to_numpy()
        if len(np.unique(y_true)) < 2:
            continue
        fpr, tpr, thresholds = roc_curve(y_true, y_score)
        auc = np.round(roc_auc_score(y_true, y_score), 3)
        name = f"{key[0]} {key[1]} {key[2]} AUC {auc}"
        for f, t, th in zip(fpr, tpr, thresholds):
            rows.append({
                "model": name,
                "False Positive Rate": f,
                "True Positive Rate": t,
                "Threshold": th,
                "F1 Score": f1_score(
                    y_true, y_score > th, zero_division=0
                ),
            })
    return pd.DataFrame(rows)


def write_roc_html(df_roc: pd.DataFrame, path) -> str:
    """ROC curves → HTML (plotly if importable, SVG fallback)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import plotly.express as px

        fig = px.area(
            df_roc, x="False Positive Rate", y="True Positive Rate",
            hover_data=["Threshold", "F1 Score"], animation_frame="model",
        )
        fig.add_shape(type="line", line=dict(dash="dash"),
                      x0=0, x1=1, y0=0, y1=1)
        fig.write_html(str(path))
        return str(path)
    except ImportError:
        pass

    size, pad = 420, 40
    palette = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd",
               "#ff7f0e", "#8c564b", "#17becf", "#7f7f7f"]

    def sx(v):
        return pad + v * (size - 2 * pad)

    def sy(v):
        return size - pad - v * (size - 2 * pad)

    parts = [
        f'<svg width="{size}" height="{size}" '
        f'style="background:#fff;border:1px solid #ddd">',
        f'<line x1="{sx(0)}" y1="{sy(0)}" x2="{sx(1)}" y2="{sy(1)}" '
        f'stroke="#aaa" stroke-dasharray="4"/>',
    ]
    legends = []
    for i, (model, sub) in enumerate(df_roc.groupby("model")):
        color = palette[i % len(palette)]
        pts = " ".join(
            f"{sx(f):.1f},{sy(t):.1f}"
            for f, t in zip(sub["False Positive Rate"],
                            sub["True Positive Rate"])
        )
        parts.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>'
        )
        legends.append(
            f'<span style="color:{color};font-family:sans-serif;'
            f'font-size:12px">&#9632; '
            f"{html_mod.escape(str(model))}</span>"
        )
    parts.append("</svg>")
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>ROC Curve</title></head><body>"
        "<h3 style='font-family:sans-serif'>ROC Curves</h3>"
        + "".join(parts) + "<br>" + "<br>".join(legends)
        + "</body></html>"
    )
    with open(path, "w") as fh:
        fh.write(doc)
    return str(path)


def late_fusion_cv(
    df: pd.DataFrame,
    dataset: str,
    arch: str,
    n_splits: int = 5,
    seed: int = 42,
    hidden: tuple = (512,),
) -> list[dict]:
    """Patient-level PET+CT mean-embedding fusion under stratified CV.

    Mirrors embedding_classifier.py:67-116: per patient, the mean PET and
    CT embeddings concatenate into one vector; an sklearn MLP
    (lbfgs, logistic) is scored per fold.  Returns a list of
    ``{'kfold', 'report', 'baseline_report'}`` dicts where
    ``baseline_report`` scores the end-to-end model's majority vote the
    same way the reference prints for comparison.
    """
    data = df[(df["dataset"] == dataset) & (df["arch"] == arch)]
    patients_labels = data.groupby("patient_id")["y_true"].first()
    patients = patients_labels.index.to_list()
    labels = patients_labels.astype(int).to_list()

    feats, votes = [], []
    for pid in patients:
        sub = data[data["patient_id"] == pid]
        pet = np.stack(
            sub[sub["modality"] == "pet"]["embedding"].to_list()
        ).mean(axis=0)
        ct = np.stack(
            sub[sub["modality"] == "ct"]["embedding"].to_list()
        ).mean(axis=0)
        feats.append(np.concatenate([pet, ct]))
        votes.append(int(sub["y_pred"].astype(int).mean() > 0.5))
    feats = np.stack(feats)
    labels = np.asarray(labels)
    votes = np.asarray(votes)

    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    results = []
    for kfold, (train_idx, test_idx) in enumerate(skf.split(patients, labels)):
        clf = MLPClassifier(hidden_layer_sizes=hidden, solver="lbfgs",
                            activation="logistic", early_stopping=False,
                            validation_fraction=0.3)
        clf.fit(feats[train_idx], labels[train_idx])
        y_pred = clf.predict(feats[test_idx])
        results.append({
            "kfold": kfold,
            "report": classification_report(
                labels[test_idx], y_pred, output_dict=True, zero_division=0),
            "baseline_report": classification_report(
                labels[test_idx], votes[test_idx], output_dict=True,
                zero_division=0),
        })
    return results
