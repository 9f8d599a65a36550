"""Dataset splitting: kfold wrappers + scaffold/random splits.

Same surface as the reference (/root/reference/tasks/split.py): ``Splitter``
('Nfold_{random,scaffold,group,stratified}'), ``random_scaffold_split``
(Bemis-Murcko scaffold buckets, RNG-permuted, greedy fill test->valid->train)
and ``random_split``.  Scaffold keys come from mmdti_tpu.chem.murcko_scaffold
(RDKit string when available, canonical graph key otherwise).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from sklearn.model_selection import GroupKFold, KFold, StratifiedKFold, train_test_split

from mmdti_tpu.chem import murcko_scaffold


class Splitter:
    def __init__(self, split_method: str = "5fold_random", seed: int = 42):
        self.n_splits = int(split_method.split("fold")[0])
        self.method = split_method.split("_")[-1]
        self.seed = seed
        self.splitter = self._init_split()

    def _init_split(self):
        if self.method == "random":
            return KFold(n_splits=self.n_splits, shuffle=True, random_state=self.seed)
        if self.method in ("scaffold", "group"):
            return GroupKFold(n_splits=self.n_splits)
        if self.method == "stratified":
            return StratifiedKFold(n_splits=self.n_splits, shuffle=True, random_state=self.seed)
        raise ValueError(f"Unknown splitter method: {self.n_splits}fold - {self.method}")

    def split(self, data, target=None, group=None):
        try:
            # materialize: sklearn's split() is a generator, so validation
            # errors (missing groups, n_splits > n_samples, ...) raise at
            # iteration time — iterating inside the try is what lets us add
            # context while keeping the real diagnosis visible
            return list(self.splitter.split(data, target, group))
        except Exception as e:
            raise ValueError(
                f"{self.n_splits}fold_{self.method} split failed: {e}"
            ) from e


def random_scaffold_split(dataset, random_seed: int = 8, ratio_test: float = 0.1, ration_valid: float = 0.1):
    """Scaffold-bucket split with RNG-permuted bucket order and greedy
    test->valid->train filling (reference: tasks/split.py:86-132)."""
    rng = np.random.RandomState(random_seed)
    if isinstance(dataset, str):
        dataset = pd.read_csv(dataset)
    if "smiles" in dataset.columns:
        smiles_list = dataset["smiles"].values
    else:
        smiles_list = dataset["SMILES"].values

    scaffolds = defaultdict(list)
    for ind, smiles in enumerate(smiles_list):
        scaffolds[murcko_scaffold(smiles, include_chirality=True)].append(ind)
    keys = list(scaffolds.keys())
    keys = rng.permutation(keys)
    scaffold_sets = [scaffolds[k] for k in keys]

    n_total_valid = int(ration_valid * len(dataset) * (1 - ratio_test))
    n_total_test = int(ratio_test * len(dataset))
    train_idx, valid_idx, test_idx = [], [], []
    for ss in scaffold_sets:
        if len(test_idx) + len(ss) <= n_total_test:
            test_idx.extend(ss)
        elif len(valid_idx) + len(ss) <= n_total_valid:
            valid_idx.extend(ss)
        else:
            train_idx.extend(ss)

    assert not set(train_idx) & set(valid_idx)
    assert not set(test_idx) & set(valid_idx)
    assert len(set(train_idx)) + len(set(test_idx)) + len(set(valid_idx)) == len(smiles_list)
    return dataset.iloc[train_idx], dataset.iloc[valid_idx], dataset.iloc[test_idx]


def random_split(data, random_seed: int = 8, ratio_test: float = 0.1, ration_valid: float = 0.1):
    if isinstance(data, str):
        data = pd.read_csv(data)
    rest, test = train_test_split(data, test_size=ratio_test, random_state=random_seed)
    train, val = train_test_split(rest, test_size=ration_valid, random_state=random_seed)
    assert len(train) + len(val) + len(test) == len(data)
    return train, val, test
