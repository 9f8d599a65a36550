"""Target scaling (host side, sklearn-backed).

Same surface as the reference TargetScaler
(/root/reference/data/datascaler.py:40-197): 8 scaler modes plus 'auto'
(robust when |skew|>5 or |kurtosis|>20 else standard), per-column scaler lists
with NaN masking for multilabel regression, joblib persistence to
``target_scaler.ss`` in the experiment dir, and inverse transform.
"""

from __future__ import annotations

import os
from typing import Optional

import joblib
import numpy as np
from scipy.stats import kurtosis, skew
from sklearn.preprocessing import (
    FunctionTransformer,
    MaxAbsScaler,
    MinMaxScaler,
    Normalizer,
    PowerTransformer,
    QuantileTransformer,
    RobustScaler,
    StandardScaler,
)

from mmdti_tpu.utils.logger import logger

SCALER_MODE = {
    "minmax": MinMaxScaler,
    "standard": StandardScaler,
    "robust": RobustScaler,
    "maxabs": MaxAbsScaler,
    "quantile": QuantileTransformer,
    "power_trans": PowerTransformer,
    "normalizer": Normalizer,
    "log1p": FunctionTransformer,
}

_CLS_TASKS = ("classification", "multiclass", "multilabel_classification")
ARTIFACT_NAME = "target_scaler.ss"


class TargetScaler:
    def __init__(self, ss_method: str, task: str, load_dir: Optional[str] = None):
        self.ss_method = ss_method
        self.task = task
        self.scaler = None
        if load_dir and os.path.exists(os.path.join(load_dir, ARTIFACT_NAME)):
            self.scaler = joblib.load(os.path.join(load_dir, ARTIFACT_NAME))

    # -- helpers -------------------------------------------------------------
    def _make(self, method: str, target):
        if method == "power_trans":
            kind = "box-cox" if np.min(target) > 0 else "yeo-johnson"
            return SCALER_MODE[method](method=kind)
        if method == "log1p":
            # inverse_func is a deliberate fix over the reference
            # (datascaler.py:158 passes only np.log1p, so its
            # inverse_transform is the identity and predictions stay in log
            # space); expm1 restores the original target scale
            return SCALER_MODE[method](np.log1p, inverse_func=np.expm1)
        return SCALER_MODE[method]()

    def is_skewed(self, target) -> bool:
        if self.task in _CLS_TASKS:
            return False
        t = np.asarray(target, dtype=np.float64).reshape(-1)
        t = t[~np.isnan(t)]
        return abs(skew(t)) > 5.0 or abs(kurtosis(t)) > 20.0

    # -- API -----------------------------------------------------------------
    def fit(self, target, dump_dir: Optional[str] = None) -> None:
        if self.task in _CLS_TASKS or self.ss_method == "none":
            return
        target = np.asarray(target, dtype=np.float64)
        if target.ndim == 1:
            target = target.reshape(-1, 1)
        if self.task == "regression":
            method = (
                ("robust" if self.is_skewed(target) else "standard")
                if self.ss_method == "auto"
                else self.ss_method
            )
            if self.ss_method == "auto":
                logger.info("Auto selected %s transformer.", method)
            self.scaler = self._make(method, target)
            self.scaler.fit(target)
        elif self.task == "multilabel_regression":
            self.scaler = []
            for i in range(target.shape[1]):
                col = target[:, i : i + 1]
                valid = col[~np.isnan(col[:, 0])].reshape(-1, 1)
                method = (
                    ("robust" if self.is_skewed(valid) else "standard")
                    if self.ss_method == "auto"
                    else self.ss_method
                )
                sc = self._make(method, valid)
                sc.fit(valid)
                self.scaler.append(sc)
        if dump_dir:
            # multi-host single-writer rule: every process fits the identical
            # scaler (same raw CSV); only process 0 persists the artifact
            import jax

            if jax.process_count() > 1 and jax.process_index() != 0:
                return
            os.makedirs(dump_dir, exist_ok=True)
            joblib.dump(self.scaler, os.path.join(dump_dir, ARTIFACT_NAME))

    def transform(self, target):
        if self.task in _CLS_TASKS or self.ss_method == "none" or self.scaler is None:
            return target
        target = np.asarray(target, dtype=np.float64)
        if self.task == "regression":
            return self.scaler.transform(target)
        if self.task == "multilabel_regression":
            assert isinstance(self.scaler, list) and len(self.scaler) == target.shape[1]
            out = np.zeros_like(target)
            for i in range(target.shape[1]):
                col = target[:, i : i + 1]
                mask = ~np.isnan(col[:, 0])
                res = col.copy()
                if mask.any():
                    res[mask] = self.scaler[i].transform(col[mask].reshape(-1, 1))
                out[:, i] = res.reshape(-1)
            return out
        return target

    def inverse_transform(self, target):
        if self.task in _CLS_TASKS:
            return target
        if self.ss_method == "none" or self.scaler is None:
            return target
        target = np.asarray(target, dtype=np.float64)
        if self.task == "regression":
            return self.scaler.inverse_transform(target)
        if self.task == "multilabel_regression":
            assert isinstance(self.scaler, list) and len(self.scaler) == target.shape[1]
            out = np.zeros_like(target)
            for i in range(target.shape[1]):
                out[:, i] = self.scaler[i].inverse_transform(target[:, i : i + 1]).reshape(-1)
            return out
        raise ValueError(f"Unknown scaler method: {self.ss_method}")
