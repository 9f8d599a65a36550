"""Host-side metric registry.

Same metric surface as the reference (/root/reference/utils/metrics.py:72-118):
per-task registries with NaN/sentinel-masked per-column averaging, priority
ordering from a comma-separated metrics string, and early-stop direction per
metric.  Checkpoint saving is decoupled here (the trainer owns persistence);
this module only answers "did the score improve".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np
from scipy.stats import pearsonr, spearmanr
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    cohen_kappa_score,
    f1_score,
    log_loss,
    matthews_corrcoef,
    mean_absolute_error,
    mean_squared_error,
    precision_score,
    r2_score,
    recall_score,
    roc_auc_score,
)


@dataclasses.dataclass(frozen=True)
class MetricSpec:
    fn: Callable
    higher_is_better: bool
    needs_binarized: bool  # classification metrics computed on thresholded labels


def _rmse(y_true, y_pred):
    return float(np.sqrt(mean_squared_error(y_true, y_pred)))


def _pearson(y_true, y_pred):
    return float(pearsonr(y_true, y_pred)[0])


def _spearman(y_true, y_pred):
    return float(spearmanr(y_true, y_pred)[0])


def _multi_acc(y_true, y_pred):
    return float(np.mean(y_true.flatten() == np.argmax(y_pred, axis=1)))


def _log_loss_labeled(y_true, y_pred, labels=None):
    """log_loss with the label set pinned.  Without an explicit label set a
    multiclass prob matrix over a y_true that misses a class (a scaffold
    test split easily drops one) makes sklearn raise 'different number of
    classes' — the prob-matrix width IS the class count, so default to it
    (reference surface: utils/metrics.py multiclass registries)."""
    if labels is None and np.ndim(y_pred) == 2 and np.shape(y_pred)[1] > 1:
        labels = list(range(np.shape(y_pred)[1]))
    return log_loss(y_true, y_pred, labels=labels) if labels is not None else log_loss(y_true, y_pred)


REGRESSION_METRICS: Dict[str, MetricSpec] = {
    "mae": MetricSpec(mean_absolute_error, False, False),
    "pearsonr": MetricSpec(_pearson, True, False),
    "spearmanr": MetricSpec(_spearman, True, False),
    "mse": MetricSpec(mean_squared_error, False, False),
    "r2": MetricSpec(r2_score, True, False),
    "rmse": MetricSpec(_rmse, False, False),
}

CLASSIFICATION_METRICS: Dict[str, MetricSpec] = {
    "auroc": MetricSpec(roc_auc_score, True, False),
    "auc": MetricSpec(roc_auc_score, True, False),
    "auprc": MetricSpec(average_precision_score, True, False),
    "log_loss": MetricSpec(log_loss, False, False),
    "acc": MetricSpec(accuracy_score, True, True),
    "f1_score": MetricSpec(f1_score, True, True),
    "mcc": MetricSpec(matthews_corrcoef, True, True),
    "precision": MetricSpec(precision_score, True, True),
    "recall": MetricSpec(recall_score, True, True),
    "cohen_kappa": MetricSpec(cohen_kappa_score, True, True),
}

METRICS_REGISTRY: Dict[str, Dict[str, MetricSpec]] = {
    "regression": REGRESSION_METRICS,
    "classification": CLASSIFICATION_METRICS,
    "multiclass": {
        "log_loss": MetricSpec(_log_loss_labeled, False, False),
        "acc": MetricSpec(_multi_acc, True, False),
    },
    "multilabel_classification": {
        k: CLASSIFICATION_METRICS[k]
        for k in ("auroc", "auc", "auprc", "log_loss", "acc", "mcc")
    },
    "multilabel_regression": {
        k: REGRESSION_METRICS[k] for k in ("mae", "mse", "r2")
    },
}

DEFAULT_METRICS: Dict[str, List[str]] = {
    "regression": ["mse", "mae", "r2", "spearmanr", "pearsonr"],
    "classification": ["log_loss", "auc", "f1_score", "mcc", "acc", "precision", "recall"],
    "multiclass": ["log_loss", "acc"],
    "multilabel_classification": ["log_loss", "auc", "auprc"],
    "multilabel_regression": ["mse", "mae", "r2"],
}


def masked_columnwise_metric(y_true, y_pred, fn, nan_value=None, classification=False):
    """Per-column metric over valid entries, averaged across columns
    (reference: cal_nan_metric, utils/metrics.py:30-55)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    if y_true.shape != y_pred.shape:
        raise ValueError("y_true and y_pred must have same shape")
    mask = ~np.isnan(y_true)
    if classification:
        mask &= (y_true == 0.0) | (y_true == 1.0)
    if nan_value is not None:
        mask &= y_true != nan_value
    vals = []
    for col in range(y_true.shape[1]):
        m = mask[:, col]
        if not m.any():
            continue
        try:
            v = float(fn(y_true[m, col], y_pred[m, col]))
        except ValueError:
            # Uncomputable column (e.g. log_loss when the valid labels contain
            # a single class — common on small or scaffold-split validation
            # sets): skip the column instead of killing the fit.
            continue
        if np.isnan(v):
            # sklearn signals the same condition with a NaN + warning for
            # roc_auc_score; a NaN column must not poison the other columns.
            continue
        vals.append(v)
    return float(np.mean(vals)) if vals else float("nan")


class Metrics:
    """Metric computation + early-stop judgement for one task."""

    def __init__(self, task: str, metrics_str: Optional[str] = None, **_):
        if task not in METRICS_REGISTRY:
            raise ValueError(f"Unknown task: {task}")
        self.task = task
        self.registry = METRICS_REGISTRY[task]
        self.metric_names = self._resolve(metrics_str)

    def _resolve(self, metrics_str) -> List[str]:
        if not isinstance(metrics_str, str) or metrics_str in ("", "none"):
            return list(DEFAULT_METRICS[self.task])
        requested = metrics_str.split(",")
        for name in requested:
            if name not in self.registry:
                raise ValueError(f"Unknown metric: {name}")
        return requested + [k for k in self.registry if k not in requested]

    # ---- computation ------------------------------------------------------
    def cal_metric(self, label, predict, nan_value=-1.0, threshold=0.5, label_cnt=None):
        label = np.asarray(label)
        predict = np.asarray(predict)
        if self.task in ("regression", "multilabel_regression"):
            return {
                name: masked_columnwise_metric(label, predict, self.registry[name].fn, nan_value)
                for name in self.metric_names
            }
        if self.task in ("classification", "multilabel_classification"):
            out = {}
            for name in self.metric_names:
                spec = self.registry[name]
                pred = (predict > threshold).astype(int) if spec.needs_binarized else predict
                # pass labels as float: masked_columnwise_metric masks NaN /
                # sentinel / non-{0,1} rows itself, and an int cast of NaN is
                # undefined (0 on aarch64 saturating casts -> a fake negative)
                out[name] = masked_columnwise_metric(
                    label, pred, spec.fn, nan_value, classification=True
                )
            return out
        if self.task == "multiclass":
            out = {}
            for name in self.metric_names:
                spec = self.registry[name]
                if name == "log_loss" and label_cnt is not None:
                    out[name] = spec.fn(label, predict, labels=list(range(label_cnt)))
                else:
                    out[name] = spec.fn(label, predict)
            return out
        raise ValueError(f"Unsupported task {self.task}")

    # ---- early stopping ----------------------------------------------------
    def primary_metric(self) -> str:
        return self.metric_names[0]

    def is_improvement(self, score: float, best: Optional[float]) -> bool:
        if best is None or not np.isfinite(best):
            return True
        if self.registry[self.primary_metric()].higher_is_better:
            return score >= best
        return score <= best

    def initial_best(self) -> float:
        return float("-inf") if self.registry[self.primary_metric()].higher_is_better else float("inf")

    # ---- classification threshold search -----------------------------------
    def search_threshold(self, target, pred, steps: int = 20, nan_value=-1.0):
        """Grid-search per-column thresholds maximizing the first binarized
        metric (reference: calculate_classification_threshold,
        utils/metrics.py:260-312).

        Missing labels are excluded per column with the same convention as
        cal_metric (NaN, the nan_value sentinel, and non-binary values);
        columns with no valid rows keep the 0.5 default."""
        target = np.asarray(target, dtype=np.float64)
        pred = np.asarray(pred, dtype=np.float64)
        spec = next(
            (self.registry[n] for n in self.metric_names if self.registry[n].needs_binarized),
            CLASSIFICATION_METRICS["f1_score"],
        )
        valid = ~np.isnan(target)
        valid &= (target == 0.0) | (target == 1.0)
        if nan_value is not None:
            valid &= target != nan_value
        ths = np.full(target.shape[1], 0.5)
        for col in range(target.shape[1]):
            m = valid[:, col]
            if not m.any():
                continue
            t, p = target[m, col].astype(int), pred[m, col]
            best_score = -np.inf if spec.higher_is_better else np.inf
            best_th = 0.5
            for th in np.linspace(p.min(), p.max(), steps):
                lab = (p > th).astype(int)
                s = spec.fn(t, lab)
                better = s > best_score if spec.higher_is_better else s < best_score
                if better:
                    best_score, best_th = s, th
            ths[col] = best_th
        return ths
