"""On-device classification metrics: weighted ROC-AUC, confusion counts.

The reference pulls every prediction to host and calls sklearn per epoch
(/root/reference/src/train_models.py:744-763).  Here the per-epoch AUC /
F1 run as jitted sort-based reductions on device; the host only receives
the final scalars.  sklearn remains the renderer for the JSON
classification-report artifact contract (see analysis/reports.py), and
these kernels are tested to agree with it.

All kernels take an optional weight vector (0-weight entries are ignored)
so padded batches work under static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["roc_auc", "binary_counts", "binary_report_metrics"]


@jax.jit
def roc_auc(y_true: jax.Array, y_score: jax.Array, weight: jax.Array | None = None):
    """Weighted binary ROC-AUC via trapezoidal integration, tie-correct.

    Matches ``sklearn.roc_auc_score(y_true, y_score, sample_weight=w)``
    (used at train_models.py:744-745 with per-patient weights): scores are
    sorted descending, weighted TP/FP counts accumulated, and tie groups
    collapsed to their last point so equal scores contribute the diagonal
    segment.

    Args:
        y_true: (N,) {0,1} labels.
        y_score: (N,) scores for class 1.
        weight: (N,) nonnegative sample weights; None = uniform.

    Returns:
        Scalar AUC in [0, 1]; NaN when a class is absent (as sklearn
        raises, we return NaN for jit-compatibility).
    """
    y_true = jnp.asarray(y_true, jnp.float32)
    y_score = jnp.asarray(y_score, jnp.float32)
    w = (
        jnp.ones_like(y_true)
        if weight is None
        else jnp.asarray(weight, jnp.float32)
    )
    # Zero-weight (padded) entries: push to the end and zero contribution.
    neg_inf = jnp.float32(-jnp.inf)
    y_score = jnp.where(w > 0, y_score, neg_inf)

    order = jnp.argsort(-y_score)  # descending
    s = y_score[order]
    t = y_true[order]
    ww = w[order]

    tps = jnp.cumsum(ww * t)
    fps = jnp.cumsum(ww * (1.0 - t))

    n = s.shape[0]
    # last index of each tie group = nearest boundary at or after me:
    # a reverse cummin over boundary positions (vectorized — a length-N
    # sequential scan here serialized the whole metric on device).
    boundary = jnp.concatenate([s[:-1] != s[1:], jnp.array([True])])
    idx = jnp.arange(n)
    group_last = lax.cummin(jnp.where(boundary, idx, n), reverse=True)
    tps = tps[group_last]
    fps = fps[group_last]

    tp_total = tps[-1]
    fp_total = fps[-1]

    tps = jnp.concatenate([jnp.zeros((1,)), tps])
    fps = jnp.concatenate([jnp.zeros((1,)), fps])
    area = jnp.sum((fps[1:] - fps[:-1]) * (tps[1:] + tps[:-1]) / 2.0)

    denom = tp_total * fp_total
    return jnp.where(denom > 0, area / denom, jnp.nan)


@jax.jit
def binary_counts(
    y_true: jax.Array, y_pred: jax.Array, weight: jax.Array | None = None
):
    """Weighted (tp, fp, tn, fn) for binary labels/predictions."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    w = (
        jnp.ones_like(y_true)
        if weight is None
        else jnp.asarray(weight, jnp.float32)
    )
    tp = jnp.sum(w * y_true * y_pred)
    fp = jnp.sum(w * (1 - y_true) * y_pred)
    tn = jnp.sum(w * (1 - y_true) * (1 - y_pred))
    fn = jnp.sum(w * y_true * (1 - y_pred))
    return tp, fp, tn, fn


def binary_report_metrics(
    y_true: jax.Array, y_pred: jax.Array, weight: jax.Array | None = None
) -> dict[str, jax.Array]:
    """Precision/recall/F1 per class + accuracy + macro F1, zero_division=0.

    Device-side equivalent of the fields the reference reads out of
    sklearn's classification_report (train_models.py:747-763,
    782-783): per-class precision/recall/f1 and accuracy, with
    zero-denominator → 0 semantics.
    """
    tp, fp, tn, fn = binary_counts(y_true, y_pred, weight)

    def safe_div(a, b):
        return jnp.where(b > 0, a / jnp.where(b > 0, b, 1.0), 0.0)

    prec1 = safe_div(tp, tp + fp)
    rec1 = safe_div(tp, tp + fn)
    f1_1 = safe_div(2 * prec1 * rec1, prec1 + rec1)

    prec0 = safe_div(tn, tn + fn)
    rec0 = safe_div(tn, tn + fp)
    f1_0 = safe_div(2 * prec0 * rec0, prec0 + rec0)

    total = tp + fp + tn + fn
    accuracy = safe_div(tp + tn, total)
    return {
        "precision_0": prec0,
        "recall_0": rec0,
        "f1_0": f1_0,
        "precision_1": prec1,
        "recall_1": rec1,
        "f1_1": f1_1,
        "accuracy": accuracy,
        "macro_f1": (f1_0 + f1_1) / 2.0,
    }
