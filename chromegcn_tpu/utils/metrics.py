"""Evaluation metrics: per-label AUROC / AUPR / recall-at-50%-FDR, mAP, F1s.

Host-side sklearn implementations matching the reference's semantics
(reference: utils/metrics.py:25-303), including:
- skipping labels where the metric is undefined (single-class columns raise
  in sklearn and the reference swallows them — utils/metrics.py:243-247),
- "FDR" = recall at the first threshold where FDR (=1-precision) <= 0.5
  (reference: utils/metrics.py:148-165),
- AUPR via the (recall, precision) trapezoid, not average_precision
  (reference: utils/metrics.py:172-173).

The reference also ships *threaded* AUROC/AUPR variants with a bug (every
thread computes all labels — utils/metrics.py:119). They are dead code in
the reference and deliberately not reproduced; ``joblib``-free vectorized
sklearn calls below are faster anyway.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from sklearn import metrics as skmetrics


def auroc(targets: np.ndarray, preds: np.ndarray) -> Tuple[float, float, float, np.ndarray]:
    """Per-label ROC AUC; returns (mean, median, var, all)."""
    out = []
    for i in range(targets.shape[1]):
        try:
            v = skmetrics.roc_auc_score(targets[:, i], preds[:, i])
            if not math.isnan(v):
                out.append(v)
        except ValueError:
            pass
    arr = np.asarray(out)
    if arr.size == 0:
        return float("nan"), float("nan"), float("nan"), arr
    return float(arr.mean()), float(np.median(arr)), float(arr.var()), arr


def aupr(targets: np.ndarray, preds: np.ndarray) -> Tuple[float, float, float, np.ndarray]:
    """Per-label PR AUC via trapezoid on the PR curve; (mean, median, var, all)."""
    out = []
    for i in range(targets.shape[1]):
        try:
            precision, recall, _ = skmetrics.precision_recall_curve(
                targets[:, i], preds[:, i], pos_label=1
            )
            v = skmetrics.auc(recall, precision)
            if not math.isnan(v):
                out.append(np.nan_to_num(v))
        except Exception:
            pass
    arr = np.asarray(out)
    if arr.size == 0:
        return float("nan"), float("nan"), float("nan"), arr
    return float(arr.mean()), float(np.median(arr)), float(arr.var()), arr


def fdr(
    targets: np.ndarray, preds: np.ndarray, fdr_cutoff: float = 0.5
) -> Tuple[float, float, float, np.ndarray]:
    """Recall at the first PR-curve point with FDR <= cutoff; (mean, median, var, all)."""
    out = []
    for i in range(targets.shape[1]):
        try:
            precision, recall, _ = skmetrics.precision_recall_curve(
                targets[:, i], preds[:, i], pos_label=1
            )
            fdr_curve = 1.0 - precision
            cutoff_index = next(k for k, x in enumerate(fdr_curve) if x <= fdr_cutoff)
            v = recall[cutoff_index]
            if not math.isnan(v):
                out.append(np.nan_to_num(v))
        except Exception:
            pass
    arr = np.asarray(out)
    if arr.size == 0:
        return float("nan"), float("nan"), float("nan"), arr
    return float(arr.mean()), float(np.median(arr)), float(arr.var()), arr


def mean_average_precision(targets: np.ndarray, preds: np.ndarray) -> float:
    """Macro average precision (reference: utils/metrics.py:25-26)."""
    return float(
        skmetrics.average_precision_score(targets, preds, average="macro", pos_label=1)
    )


def subset_accuracy(targets: np.ndarray, predictions: np.ndarray, axis: int = 1) -> float:
    return float(np.mean(np.all(targets == predictions, axis=axis)))


def hamming_loss(targets: np.ndarray, predictions: np.ndarray) -> float:
    return float(np.mean(np.logical_xor(targets, predictions)))


def f1_score(
    targets: np.ndarray, predictions: np.ndarray, average: str = "micro", axis: int = 0
) -> float:
    """Micro/macro F1 from binarized predictions (reference: utils/metrics.py:65-110)."""
    tp = np.sum(targets * predictions, axis=axis).astype(np.float64)
    fp = np.sum((1 - targets) * predictions, axis=axis).astype(np.float64)
    fn = np.sum(targets * (1 - predictions), axis=axis).astype(np.float64)
    if average == "micro":
        denom = 2 * tp.sum() + fp.sum() + fn.sum()
        return float(2 * tp.sum() / denom) if denom > 0 else 0.0
    if average == "macro":
        with np.errstate(divide="ignore", invalid="ignore"):
            per = np.true_divide(2 * tp, 2 * tp + fp + fn)
        per = per[np.isfinite(per)]
        return float(per.mean()) if per.size else 0.0
    raise ValueError("average must be 'micro' or 'macro'")


def example_f1_score(targets: np.ndarray, predictions: np.ndarray) -> float:
    """Per-example F1 averaged over examples (reference: utils/metrics.py:50-63)."""
    tp = np.sum(targets * predictions, axis=1).astype(np.float64)
    denom = targets.sum(1) + predictions.sum(1)
    keep = denom > 0
    if not keep.any():
        return 0.0
    return float(np.mean(2 * tp[keep] / denom[keep]))


def find_optimal_cutoff(targets: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """Youden-J optimal threshold per label (reference: utils/metrics.py:224-236)."""
    cutoffs = []
    for i in range(targets.shape[1]):
        try:
            fpr, tpr, thresholds = skmetrics.roc_curve(targets[:, i], preds[:, i])
            cutoffs.append(thresholds[np.argmax(tpr - fpr)])
        except Exception:
            cutoffs.append(0.5)
    return np.asarray(cutoffs)
