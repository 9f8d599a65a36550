"""DataHub: end-to-end host-side data preparation.

Re-design of the reference DataHub (/root/reference/data/datahub.py:171-349):
reads CSV/dict/list, fits/applies the target scaler per task type (fitting on
the ``raw_data`` CSV targets when provided, matching datahub.py:219-228),
computes ConR sample weights, generates (and pickle-caches) conformer
features, and attaches the SMILES string and weight to each sample dict.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from mmdti_tpu.chem import ConformerGen
from mmdti_tpu.chem.conformer import resolve_coord_provider as _resolve_provider
from mmdti_tpu.data.reader import MolDataReader
from mmdti_tpu.data.scaler import TargetScaler
from mmdti_tpu.data.weights import compute_sample_weights
from mmdti_tpu.utils.logger import logger


def _featurizer_fingerprint(params: Dict[str, Any]) -> Dict[str, Any]:
    """Every knob that changes ConformerGen's output, incl. the dictionary."""
    from mmdti_tpu.chem.dictionary import Dictionary

    dict_path = params.get("dict_path", None)
    unimol_dir = params.get("unimol_dir", "") or ""
    if dict_path is None and unimol_dir:
        cand = os.path.join(os.path.dirname(unimol_dir), "mol.dict.txt")
        dict_path = cand if os.path.exists(cand) else None
    d = Dictionary.load(dict_path)
    d.add_symbol("[MASK]", is_special=True)
    provider = _resolve_provider(params.get("coord_provider", "auto"))
    extra = {}
    if params.get("data_type", "molecule") == "mof":
        # MOF-only featurization revision: rev 2 = content-seeded
        # >max_atoms crop (a >max_atoms crystal crops differently than the
        # old shared-stream RNG for the same knobs, so pre-change MOF
        # caches must regenerate; molecule caches are untouched)
        extra["mof_rev"] = 2
    if provider == "device":
        # the device provider's per-molecule host/device size routing: a
        # different threshold re-routes molecules across refiners.  Only
        # fingerprinted when it can matter — host caches stay untouched.
        extra["device_refine_min_atoms"] = int(
            params.get("device_refine_min_atoms", 48)
        )
    return {
        **extra,
        # bumped when the featurization CODE changes output for the same
        # knobs (rev 2: divalent-aromatic implicit-H fix — thiophene/furan
        # molecules featurize differently, old caches must regenerate)
        "featurizer_rev": 2,
        "seed": params.get("seed", 42),
        "max_atoms": params.get("max_atoms", 256),
        "data_type": params.get("data_type", "molecule"),
        "method": params.get("method", "rdkit_random"),
        "mode": params.get("mode", "fast"),
        "remove_hs": bool(params.get("remove_hs", False)),
        # False drops the O(N^2) host pair arrays from each entry
        # (device-side reconstruction, ops/pair_feats.py) — a cache built
        # one way cannot serve the other
        "pair_feats": bool(params.get("pair_feats", True)),
        # RESOLVED refinement placement: host float64 and device float32
        # coordinates differ, so a cache built by one cannot serve the other
        "coord_provider": provider,
        "dict": hashlib.md5("\n".join(d.symbols).encode()).hexdigest(),
    }


class DataHub:
    def __init__(self, data=None, is_train: bool = True, save_path: Optional[str] = None, **params):
        self.data: Dict[str, Any] = {}
        self.is_train = is_train
        self.save_path = save_path
        self.task = params.get("task", None)
        self.target_cols = params.get("target_cols", None)
        self.multiclass_cnt = params.get("multiclass_cnt", None)
        self.cache_dir_train = params.get("cache_dir_train", None)
        self.cache_dir_test = params.get("cache_dir_test", None)
        self.ss_method = params.get("target_normalize", "none")
        self.all_weight = params.get("all_weight", False)
        self.raw_data = params.get("raw_data", None)
        self.lds = params.get("lds", False)
        self.lds_kernel = params.get("lds_kernel", "gaussian")
        self.lds_ks = int(params.get("lds_ks", 9))
        self.lds_sigma = float(params.get("lds_sigma", 1.0))
        self.use_scaler = params.get("use_scaler", True)
        self.max_bin = params.get("fds_num", 200)
        self.use_weight = params.get("use_weight", False)
        self._init_data(data, **params)

    # ------------------------------------------------------------------
    def _scaler_fit_source(self, fallback: np.ndarray) -> np.ndarray:
        """Targets used to *fit* the scaler: the raw training CSV when given
        (reference behavior), else this split's targets."""
        if self.raw_data and isinstance(self.raw_data, str) and os.path.exists(self.raw_data):
            cols = self.data["target_cols"]
            return pd.read_csv(self.raw_data)[cols].values
        return fallback

    def _featurize_mof(self, params: Dict[str, Any]):
        """MOF featurization: per-row CIF crystal -> coords2unimol_mof
        features + gas/environment inputs (chem/mof.py).

        Input contract (data_type='mof'): the CSV/DataFrame carries a CIF
        path column (default 'cif'; relative paths resolve against the CSV's
        directory), a gas name column (default 'gas', one of
        chem.mof.GAS_LIST), and optional 'pressure'/'temperature' columns
        (defaults 1.0 bar / 298.0 K).  The reference parses the same inputs
        through MOFReader (/root/reference/data/datareader.py:204-307) but
        never trains on them; here they feed MOFModel end to end."""
        from mmdti_tpu.chem.mof import MOFReader

        df = self.data["raw_data"]
        cif_col = params.get("cif_col", "cif")
        gas_col = params.get("gas_col", "gas")
        for col in (cif_col, gas_col):
            if col not in df.columns:
                raise ValueError(
                    f"data_type='mof' requires a {col!r} column; got "
                    f"{list(df.columns)}"
                )
        unimol_dir = params.get("unimol_dir", "") or ""
        dict_path = params.get("dict_path", None)
        if dict_path is None and unimol_dir:
            cand = os.path.join(os.path.dirname(unimol_dir), "mol.dict.txt")
            dict_path = cand if os.path.exists(cand) else None
        reader = MOFReader(
            dict_path=dict_path,
            max_atoms=int(params.get("max_atoms", 512)),
            seed=int(params.get("seed", 42)),
        )
        src = getattr(self, "_source_path", None) or (
            self.raw_data if isinstance(self.raw_data, str) else None
        )
        base = ""
        if src and os.path.exists(src):
            base = os.path.dirname(os.path.abspath(src))
        features = []
        for _, row in df.iterrows():
            cif = str(row[cif_col])
            if base and not os.path.isabs(cif) and not os.path.exists(cif):
                cif = os.path.join(base, cif)
            feat = reader.read_with_gas(cif, str(row[gas_col]))
            feat["pressure"] = float(row.get("pressure", 1.0))
            feat["temperature"] = float(row.get("temperature", 298.0))
            features.append(feat)
        logger.info("Featurized %d MOF samples from CIF files.", len(features))
        return features

    def _init_data(self, data, **params) -> None:
        # keep the source CSV path (when given one) — relative CIF paths in
        # MOF datasets resolve against it
        self._source_path = data if isinstance(data, str) else None
        self.data = MolDataReader().read_data(data, self.is_train, **params)
        task = self.task
        num_classes = self.data.get("num_classes")

        scaler = TargetScaler(self.ss_method, task, self.save_path) if self.use_scaler else None
        self.data["target_scaler"] = scaler

        raw_target = self.data["raw_target"]
        if task == "regression":
            target = np.array(raw_target, dtype=np.float32).reshape(-1, 1)
            if scaler is not None:
                # Training always REFITS (a stale target_scaler.ss from a
                # previous run into the same experiment dir would otherwise
                # be silently reused on new data); predict keeps the loaded
                # artifact.
                if self.is_train:
                    scaler.fit(self._scaler_fit_source(target), self.save_path)
                    logger.info("Fitted target scaler.")
                target = scaler.transform(target)
            self.data["target"] = np.asarray(target, dtype=np.float32)
        elif task == "classification":
            self.data["target"] = np.array(raw_target, dtype=np.int32).reshape(-1, 1)
        elif task == "multiclass":
            self.data["target"] = np.array(raw_target, dtype=np.int32).reshape(-1, 1)
            if not self.is_train:
                self.data["multiclass_cnt"] = self.multiclass_cnt
        elif task == "multilabel_regression":
            target = np.array(raw_target, dtype=np.float32).reshape(-1, num_classes)
            if scaler is not None:
                if self.is_train:  # always refit — see the regression branch
                    scaler.fit(self._scaler_fit_source(target), self.save_path)
                target = scaler.transform(target)
            self.data["target"] = np.asarray(target, dtype=np.float32)
        elif task == "multilabel_classification":
            # float32, NaN-preserving: missing labels mask out of the
            # NaN-maskable losses and the column-averaged metrics rather
            # than poisoning (or crashing) an integer cast
            self.data["target"] = np.array(raw_target, dtype=np.float32).reshape(-1, num_classes)
        elif task == "repr":
            self.data["target"] = raw_target
        else:
            raise ValueError(f"Unknown task: {task}")

        # sample weights
        if self.use_weight and task != "repr":
            self.data["weights"] = compute_sample_weights(
                self.data["target"], all_weight=self.all_weight, lds=self.lds,
                max_bin=self.max_bin, lds_kernel=self.lds_kernel,
                lds_ks=self.lds_ks, lds_sigma=self.lds_sigma,
            )
            logger.info("Computed %s sample weights.", "per-column" if self.all_weight else "single-column")
        else:
            if task != "repr":
                tgt = np.asarray(self.data["target"])
            else:
                n = len(self.data["smiles"] or self.data.get("atoms") or [])
                tgt = np.zeros((n, 1))
            self.data["weights"] = np.ones_like(tgt, dtype=np.float32)

        # conformer features (cached; the cache is keyed by the featurizer
        # params so changing seed/max_atoms/remove_hs/... cannot silently
        # reuse stale features — a flaw the reference shares,
        # /root/reference/data/datahub.py:313-334)
        cache_dir = self.cache_dir_train if self.is_train else self.cache_dir_test
        fingerprint = _featurizer_fingerprint(params)
        features = None
        if cache_dir is not None and os.path.exists(cache_dir):
            with open(cache_dir, "rb") as f:
                cached = pickle.load(f)
            if isinstance(cached, dict) and "features" in cached:
                if cached.get("fingerprint") == fingerprint:
                    features = cached["features"]
                    logger.info("Loaded conformer features from cache %s", cache_dir)
                else:
                    logger.warning(
                        "Conformer cache %s was built with different featurizer "
                        "params (%s != %s); regenerating.",
                        cache_dir, cached.get("fingerprint"), fingerprint,
                    )
            else:  # legacy unfingerprinted cache: cannot be trusted
                logger.warning(
                    "Conformer cache %s has no featurizer fingerprint; regenerating.",
                    cache_dir,
                )
        if features is None:
            if params.get("data_type", "molecule") == "mof":
                features = self._featurize_mof(params)
            elif "atoms" in self.data and "coordinates" in self.data:
                features = ConformerGen(**params).transform_raw(
                    self.data["atoms"], self.data["coordinates"]
                )
            else:
                features = ConformerGen(**params).transform(self.data["smiles"])
            if cache_dir is not None:
                os.makedirs(os.path.dirname(os.path.abspath(cache_dir)), exist_ok=True)
                with open(cache_dir, "wb") as f:
                    pickle.dump({"fingerprint": fingerprint, "features": features}, f)
                logger.info("Saved conformer features to cache %s", cache_dir)

        weights = np.asarray(self.data["weights"])
        smiles = self.data.get("smiles")
        for idx, item in enumerate(features):
            if smiles is not None:  # raw atoms/coords input has no SMILES
                item["smile"] = smiles[idx]
            item["weights"] = weights[idx] if weights.ndim > 0 else weights
        self.data["unimol_input"] = features
