"""Molecular data reading.

Re-design of the reference MolDataReader (/root/reference/data/datareader.py:25-201):
CSV path / dict / SMILES-list input, target-column resolution (explicit list,
TARGET-prefix discovery, or -1.0 placeholders for predict), 3-sigma anomaly
filtering for regression, SMILES validity filtering, Murcko scaffold
computation, and raw atoms/coordinates passthrough.

Conscious fix vs the reference: invalid-SMILES filtering happens *before*
target extraction, so targets, smiles and scaffolds always stay aligned (the
reference extracts targets from the unfiltered frame,
data/datareader.py:105-118).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import pandas as pd

from mmdti_tpu.chem import is_valid_smiles, murcko_scaffold
from mmdti_tpu.utils.logger import logger


class MolDataReader:
    def read_data(self, data=None, is_train: bool = True, **params) -> Dict[str, Any]:
        task = params.get("task", None)
        target_cols = params.get("target_cols", None)
        if isinstance(target_cols, str):
            target_cols = [c for c in target_cols.split(",") if c]
        smiles_col = params.get("smiles_col", "SMILES")
        target_col_prefix = params.get("target_col_prefix", "TARGET")
        anomaly_clean = params.get("anomaly_clean", False)
        smi_strict = params.get("smi_strict", False)
        split_group_col = params.get("split_group_col", "scaffold")

        if isinstance(data, str):
            data = pd.read_csv(data)
        elif isinstance(data, pd.DataFrame):
            data = data.copy()
        elif isinstance(data, dict):
            data = dict(data)
            if "target" in data:
                label = np.array(data.pop("target"))
                if label.ndim == 1 or label.shape[1] == 1:
                    data[target_col_prefix] = label.reshape(-1)
                else:
                    for i in range(label.shape[1]):
                        data[target_col_prefix + str(i)] = label[:, i]
            data = pd.DataFrame(data).rename(columns={smiles_col: "SMILES"})
            smiles_col = "SMILES"
        elif isinstance(data, list):
            data = pd.DataFrame(data, columns=["SMILES"])
            smiles_col = "SMILES"
        else:
            raise ValueError(f"Unknown data type: {type(data)}")

        # SMILES validity filter first, keeping everything aligned
        if smiles_col in data.columns:
            mask = data[smiles_col].map(
                lambda smi: self.check_smiles(smi, is_train, smi_strict)
            )
            if not mask.all():
                data = data[mask].reset_index(drop=True)

        if task == "repr":
            targets = None
            target_cols = None
            num_classes = None
            multiclass_cnt = None
        else:
            if target_cols is None:
                target_cols = [c for c in data.columns if c.startswith(target_col_prefix)]
            else:
                # predict-time placeholder sentinel, filled PER missing
                # column (deliberate fix over the reference, whose
                # `data[target_cols] = -1.0` at datareader.py:96 overwrites
                # every target column — including real labels — as soon as
                # one is absent)
                for col in target_cols:
                    if col not in data.columns:
                        data[col] = -1.0
            if is_train and anomaly_clean:
                data = self.anomaly_clean(data, task, target_cols)
            multiclass_cnt = (
                int(data[target_cols].max().max() + 1) if (is_train and task == "multiclass") else None
            )
            targets = data[target_cols].values.tolist()
            num_classes = len(target_cols)

        dd: Dict[str, Any] = {
            "raw_data": data,
            "raw_target": targets,
            "num_classes": num_classes,
            "target_cols": target_cols,
            "multiclass_cnt": multiclass_cnt,
        }
        if smiles_col in data.columns:
            dd["smiles"] = data[smiles_col].tolist()
            dd["scaffolds"] = [murcko_scaffold(s) for s in dd["smiles"]]
        else:
            dd["smiles"] = None
            dd["scaffolds"] = None

        if split_group_col in data.columns:
            dd["group"] = data[split_group_col].tolist()
        elif split_group_col == "scaffold":
            dd["group"] = dd["scaffolds"]
        else:
            dd["group"] = None

        if "atoms" in data.columns and "coordinates" in data.columns:
            dd["atoms"] = data["atoms"].tolist()
            dd["coordinates"] = data["coordinates"].tolist()
        return dd

    def check_smiles(self, smi: str, is_train: bool, smi_strict: bool) -> bool:
        if not is_valid_smiles(smi):
            if is_train and not smi_strict:
                logger.info(f"Illegal SMILES clean: {smi}")
                return False
            raise ValueError(f"SMILES rule is illegal: {smi}")
        return True

    def anomaly_clean(self, data: pd.DataFrame, task: str, target_cols: List[str]) -> pd.DataFrame:
        if task in ("classification", "multiclass", "multilabel_classification", "multilabel_regression"):
            return data
        if task == "regression":
            sz = data.shape[0]
            col = target_cols[0]
            mean, std = data[col].mean(), data[col].std()
            # constant (std=0) or single-row (std=NaN) targets: the 3-sigma
            # band is empty/undefined and would drop the whole dataset
            if not np.isfinite(std) or std == 0.0:
                logger.info("Anomaly clean skipped: target std is %s", std)
                return data
            data = data[(data[col] > mean - 3 * std) & (data[col] < mean + 3 * std)].reset_index(drop=True)
            logger.info("Anomaly clean with 3 sigma threshold: %d -> %d", sz, data.shape[0])
            return data
        raise ValueError(f"Unknown task: {task}")
