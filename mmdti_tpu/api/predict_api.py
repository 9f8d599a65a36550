"""MolPredict: the user-facing inference API.

Same surface and output contract as the reference MolPredict
(/root/reference/predict.py:22-175): loads the experiment dir's config.yaml,
rebuilds the pipeline with is_train=False, runs inference with the best
checkpoint, inverse-transforms predictions, binarizes classification with the
stored threshold, computes metrics when ground truth is present (-1.0
sentinel), and writes <prefix>.predict.<run_id>.csv.
"""

from __future__ import annotations

import os
from typing import Optional

import joblib
import numpy as np
import pandas as pd

from mmdti_tpu.configs.config import load_yaml
from mmdti_tpu.data.batching import MolDataset
from mmdti_tpu.data.hub import DataHub
from mmdti_tpu.train.nnmodel import NNModel
from mmdti_tpu.train.trainer import Trainer
from mmdti_tpu.utils.logger import logger


class MolPredict:
    def __init__(self, load_model: Optional[str] = None, cache_dir: Optional[str] = None,
                 extract_feature: bool = False):
        if not load_model:
            raise ValueError("load_model is empty")
        self.load_model = load_model
        self.config = load_yaml(os.path.join(load_model, "config.yaml"))
        self.config.target_cols = str(self.config.target_cols).split(",")
        self.task = self.config.task
        self.config.cache_dir_test = cache_dir
        self.target_cols = self.config.target_cols
        self.extract_feature = extract_feature

    def predict(self, data, save_path: Optional[str] = None, metrics: str = "none"):
        self.save_path = save_path
        if metrics and metrics != "none":
            self.config.metrics = metrics
        self.datahub = DataHub(
            data=data, is_train=False, save_path=self.load_model, **self.config
        )
        self.trainer = Trainer(save_path=self.load_model, **self.config)
        cfg = dict(self.config)
        cfg["evaluate_only"] = True  # skip the discarded init + pretrained load
        self.model = NNModel(self.datahub.data, self.datahub.data, self.trainer, **cfg)
        self.model.evaluate(self.trainer, self.load_model)

        y_pred = self.model.cv["test_pred"]
        scaler = self.datahub.data["target_scaler"]
        if scaler is not None and scaler.scaler is not None:
            y_pred = scaler.inverse_transform(y_pred)

        df = self.datahub.data["raw_data"].copy()
        predict_cols = ["predict_" + col for col in self.target_cols]
        if self.task == "multiclass" and self.config.get("multiclass_cnt") is not None:
            prob_cols = ["prob_" + str(i) for i in range(self.config.multiclass_cnt)]
            df[prob_cols] = y_pred
            df[predict_cols] = np.argmax(y_pred, axis=1).reshape(-1, 1)
        elif self.task in ["classification", "multilabel_classification"]:
            threshold = joblib.load(os.path.join(self.load_model, "threshold.dat"))
            prob_cols = ["prob_" + col for col in self.target_cols]
            df[prob_cols] = y_pred
            df[predict_cols] = (y_pred > threshold).astype(int)
        else:
            prob_cols = predict_cols
            df[predict_cols] = y_pred

        if self.save_path:
            os.makedirs(self.save_path, exist_ok=True)
        if not (df[self.target_cols] == -1.0).all().all():
            score = self.trainer.metrics.cal_metric(
                df[self.target_cols].values, df[prob_cols].values
            )
            logger.info("final predict metrics score: \n%s", score)
            if self.save_path:
                joblib.dump(score, os.path.join(self.save_path, "test_metric.result"))
        else:
            df.drop(self.target_cols, axis=1, inplace=True)
        if self.save_path:
            prefix = data.split("/")[-1].split(".")[0] if isinstance(data, str) else "test"
            self.save_predict(df, self.save_path, prefix)
            logger.info("pipeline finish!")
        if self.extract_feature:
            dataset = MolDataset(
                self.datahub.data["unimol_input"], np.asarray(self.datahub.data["target"])
            )
            self.cv_repr = self.trainer.inference(
                self.model.model_infer, self.model.params, dataset, self.model.collator,
                return_atomic_reprs=True, dictionary=self.model.dictionary,
            )
        return y_pred

    def save_predict(self, data: pd.DataFrame, out_dir: str, prefix: str) -> None:
        run_id = 0
        if not os.path.exists(out_dir):
            os.makedirs(out_dir)
        else:
            existing = set(os.listdir(out_dir))
            while f"{prefix}.predict.{run_id}.csv" in existing:
                run_id += 1
        path = os.path.join(out_dir, f"{prefix}.predict.{run_id}.csv")
        data.to_csv(path)
        logger.info("save predict result to %s", path)
