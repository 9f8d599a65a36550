"""MolTrain: the user-facing fit API.

Same public surface and artifact contract as the reference MolTrain
(/root/reference/train.py:21-212): ~40 kwargs layered over the default config,
experiment dir receives config.yaml + target_scaler.ss + threshold.dat +
model_0.ckpt, and MolPredict reloads them verbatim.
"""

from __future__ import annotations

import os
from typing import Optional

import joblib
import numpy as np

from mmdti_tpu.configs.config import default_config, save_yaml
from mmdti_tpu.data.hub import DataHub
from mmdti_tpu.train.nnmodel import NNModel
from mmdti_tpu.train.trainer import Trainer
from mmdti_tpu.utils.logger import logger


def _is_writer_process() -> bool:
    """Multi-host single-writer rule: every process runs the identical fit
    against a shared experiment dir; only process 0 writes artifacts
    (mirrors the trainer's checkpoint gating)."""
    import jax

    return jax.process_count() == 1 or jax.process_index() == 0


class MolTrain:
    def __init__(
        self,
        task: str = "classification",
        data_type: str = "molecule",
        epochs: int = 10,
        learning_rate: float = 1e-4,
        batch_size: int = 16,
        early_stopping: int = 5,
        metrics: str = "none",
        save_path: str = "./exp",
        remove_hs: bool = False,
        smiles_col: str = "SMILES",
        target_col_prefix: str = "TARGET",
        target_cols=None,
        target_anomaly_check: str = "filter",
        smiles_check: str = "filter",
        target_normalize: str = "auto",
        max_norm: float = 5.0,
        use_cuda: bool = True,
        use_amp: bool = True,
        model_name: str = "mm_model",
        chemberta_dir: str = "",
        unimol_dir: str = "",
        using_infonce: bool = False,
        using_ct: bool = False,
        cache_dir_train: Optional[str] = None,
        cache_dir_test: Optional[str] = None,
        use_weight: bool = False,
        all_weight: bool = False,
        alpha: float = 1,
        beta: float = 0.1,
        raw_data: Optional[str] = None,
        fds: bool = False,
        lds: bool = False,
        lds_kernel: str = "gaussian",
        lds_ks: int = 9,
        lds_sigma: float = 1.0,
        seed: int = 42,
        use_scaler: bool = True,
        fds_num: int = 200,
        fds_raw_path: str = "",
        fds_col_data: str = "",
        ct_lamda: float = 1.0,
        ct_w: float = 0.2,
        threshold_search: bool = False,
        kfold: int = 5,
        split: str = "random",
        split_group_col: str = "scaffold",
        **params,
    ):
        config = default_config()
        config.task = task
        config.data_type = data_type
        config.epochs = epochs
        config.learning_rate = learning_rate
        config.batch_size = batch_size
        config.patience = early_stopping
        config.metrics = metrics
        config.remove_hs = remove_hs
        config.smiles_col = smiles_col
        config.target_col_prefix = target_col_prefix
        config.target_cols = target_cols
        config.anomaly_clean = target_anomaly_check in ["filter"]
        config.smi_strict = smiles_check in ["filter"]
        config.target_normalize = target_normalize
        config.max_norm = max_norm
        config.use_cuda = use_cuda
        config.use_amp = use_amp
        config.model_name = model_name
        config.chemberta_dir = chemberta_dir
        config.unimol_dir = unimol_dir
        config.using_ct = using_ct
        config.using_infonce = using_infonce
        config.cache_dir_train = cache_dir_train
        config.cache_dir_test = cache_dir_test
        config.use_weight = use_weight
        config.all_weight = all_weight
        config.alpha = alpha
        config.beta = beta
        config.raw_data = raw_data
        config.fds = fds
        config.lds = lds
        # LDS smoothing kernel knobs (reference lds_config, data/datahub.py:24-29)
        config.lds_kernel = lds_kernel
        config.lds_ks = lds_ks
        config.lds_sigma = lds_sigma
        config.seed = seed
        config.use_scaler = use_scaler
        config.fds_num = fds_num
        config.fds_raw_path = fds_raw_path
        config.fds_col_data = (
            fds_col_data if fds_col_data != "" else (target_cols[0] if target_cols else "")
        )
        config.ct_w = ct_w
        config.ct_lamda = ct_lamda
        config.threshold_search = threshold_search
        # k-fold CV knobs (reference kwargs at /root/reference/train.py:88-90;
        # there they are config-only — NNModel.run trains fold 0 regardless.
        # Here they are LIVE when fit() is called without a validation set:
        # fit(train) runs real kfold CV — see fit()).
        config.kfold = int(kfold)
        config.split = split
        config.split_group_col = split_group_col
        config.update_from(params)
        self.save_path = save_path
        self.config = config

    # ------------------------------------------------------------------
    def fit(self, data_train, data_val=None):
        """Fit on a training CSV/dict/list.

        Two calling patterns:

        * ``fit(train, val)`` — reference behavior (/root/reference/train.py:150):
          one model (fold 0) trained against the explicit held-out set.  The
          ``kfold`` kwarg is config-only here, exactly as in the reference
          (its NNModel.run trains fold 0 regardless of kfold).
        * ``fit(train)`` — k-fold cross-validation, a calling pattern the
          reference cannot handle (its fit requires data_val positionally):
          ``kfold`` models trained on Splitter-assigned folds
          (``split``/``split_group_col`` select random/scaffold/group/
          stratified assignment), each saved as ``model_{fold}.ckpt``;
          ``cv_pred`` holds out-of-fold predictions in dataset order, and
          MolPredict/NNModel.evaluate average all fold checkpoints.
        """
        kfold = int(self.config.get("kfold", 5) or 1)
        if data_val is None:
            if kfold <= 1:
                raise ValueError(
                    "fit(data_train) without a validation set requires "
                    f"kfold > 1 for cross-validation (got kfold={kfold}); "
                    "pass data_val for a single train/val run"
                )
            return self._fit_cv(data_train, kfold)
        self.datahub = DataHub(
            data=data_train, is_train=True, save_path=self.save_path, **self.config
        )
        self.datahub_1 = DataHub(
            data=data_val, is_train=False, save_path=self.save_path, **self.config
        )
        self.data_train = self.datahub.data
        self.data_test = self.datahub_1.data
        self.update_and_save_config(n_folds=1)
        self.trainer = Trainer(save_path=self.save_path, **self.config)
        self.model = NNModel(self.data_train, self.data_test, self.trainer, **self.config)
        self.model.run()
        return self._finalize(val_true=np.asarray(self.data_test["target"], dtype=float))

    def _fit_cv(self, data_train, kfold: int):
        """K-fold cross-validation: one DataHub (featurize/scale once), one
        NNModel (one model build + param init shared as the per-fold starting
        point), Trainer.fit_predict per fold with the fold's slices."""
        self.datahub = DataHub(
            data=data_train, is_train=True, save_path=self.save_path, **self.config
        )
        self.data_train = self.datahub.data
        self.data_test = self.data_train  # pad-length source; folds slice it
        self.update_and_save_config(n_folds=kfold)
        self.trainer = Trainer(save_path=self.save_path, **self.config)
        self.model = NNModel(self.data_train, self.data_train, self.trainer, **self.config)
        self.model.run_cv(self._cv_splits(kfold))
        return self._finalize(val_true=np.asarray(self.data_train["target"], dtype=float))

    def _cv_splits(self, kfold: int):
        """Fold index pairs from the Splitter, honoring the reference's
        split-method surface (random/scaffold/group/stratified,
        /root/reference/train.py:88-90 + tasks/split.py)."""
        from mmdti_tpu.splits import Splitter

        method = str(self.config.get("split", "random"))
        splitter = Splitter(f"{kfold}fold_{method}", seed=int(self.config.get("seed", 42)))
        target = np.asarray(self.data_train["target"])
        idx = np.arange(target.shape[0])
        if method in ("scaffold", "group"):
            group = self.data_train.get("group")
            if group is None:
                raise ValueError(
                    f"split='{method}' needs group labels: provide the "
                    f"'{self.config.get('split_group_col', 'scaffold')}' "
                    "column or SMILES input (scaffolds are derived from it)"
                )
            return splitter.split(idx, group=np.asarray(group))
        if method == "stratified":
            return splitter.split(idx, target=target[:, 0].astype(int))
        return splitter.split(idx)

    def _finalize(self, val_true: np.ndarray):
        """Shared fit tail: inverse-scale predictions, write threshold.dat,
        expose cv_pred.  val_true: the labels cv['pred'] aligns to (the
        explicit validation set, or the full train set for out-of-fold CV)."""
        scaler = self.data_train["target_scaler"]
        y_pred = self.model.cv["pred"]
        if scaler is not None and scaler.scaler is not None:
            y_pred = scaler.inverse_transform(y_pred)
        if self.config["task"] in ["classification", "multilabel_classification"]:
            # The reference hardcodes 0.5 (its grid search is commented out,
            # /root/reference/train.py:187); threshold_search=True enables the
            # per-column validation-set grid search as a strict superset.
            threshold = 0.5
            if self.config.get("threshold_search"):
                val_pred = np.asarray(self.model.cv["pred"], dtype=float)
                threshold = self.trainer.metrics.search_threshold(val_true, val_pred)
                logger.info("Searched classification thresholds: %s", threshold)
            if _is_writer_process():
                joblib.dump(threshold, os.path.join(self.save_path, "threshold.dat"))
        self.cv_pred = y_pred
        return self

    def update_and_save_config(self, n_folds: int = 1):
        self.config["num_classes"] = self.data_train["num_classes"]
        self.config["target_cols"] = ",".join(self.data_train["target_cols"])
        if self.config["task"] == "multiclass":
            self.config["multiclass_cnt"] = self.data_train["multiclass_cnt"]
        self.config["split_method"] = (
            f"{self.config.get('kfold', 5)}fold_{self.config.get('split', 'random')}"
        )
        # how many model_{fold} checkpoints this experiment actually produces
        # (the reference's kfold config never changes that — always 1); the
        # predict/serve side reads this instead of trusting kfold, so a stale
        # model_1.ckpt from an earlier CV run in a reused dir is never
        # silently ensembled into a later single-fold experiment
        self.config["model_folds"] = int(n_folds)
        if self.save_path is not None and _is_writer_process():
            if not os.path.exists(self.save_path):
                logger.info("Create output directory: %s", self.save_path)
                os.makedirs(self.save_path)
            else:
                logger.info("Output directory already exists: %s (overwriting)", self.save_path)
            save_yaml(self.config, os.path.join(self.save_path, "config.yaml"))
