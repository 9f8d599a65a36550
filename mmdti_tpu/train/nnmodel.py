"""Task-level model orchestration.

Capability twin of the reference NNModel (/root/reference/models/nnmodel.py:52-287):
resolves the per-task loss / activation / output-dim registries, builds the
flagship model (+ tokenizer + atom dictionary), initializes or loads
parameters (pretrained Uni-Mol / ChemBERTa ingestion), applies name-prefix
layer freezing, prepares FDS state, and drives Trainer.fit_predict / predict.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mmdti_tpu.chem.dictionary import Dictionary
from mmdti_tpu.chem.tokenizer import load_tokenizer
from mmdti_tpu.data.batching import BatchCollator, MolDataset, dataset_pad_lengths
from mmdti_tpu.losses.fds import fds_bucket_params, fds_kernel_window, init_fds_state
from mmdti_tpu.losses.registry import (
    ACTIVATION_REGISTRY,
    resolve_loss,
    resolve_output_dim,
)
from mmdti_tpu.models.convert import load_pretrained
from mmdti_tpu.models.mm_model import build_model
from mmdti_tpu.train.trainer import Trainer, load_checkpoint
from mmdti_tpu.utils.logger import logger


def pallas_remat_threshold(
    batch_size: int, attention_heads: int = 64, encoder_layers: int = 15
) -> int:
    """Atom-pad at which the engaged-Pallas path auto-enables encoder remat.

    The no-remat window is bounded by activation residency in HBM, dominated
    by the bf16 pair-logit chain: ~B*H*N^2*2 bytes per layer over L layers.
    Measured on the v5e with the flagship arch (H=64, L=15): B=64/N=256 FITS
    (chain ~8GB of 16GB HBM) and runs 18% faster without remat (201 vs 245
    ms/step), while doubling either B or N^2 from there puts the chain alone
    at ~16GB.  Hold that measured BYTE contour — scaled by the actual
    heads*layers so bigger architectures shrink the window instead of
    inheriting the flagship's envelope — and cap at 320, the
    round-2-validated B=32 flagship threshold; no-remat shapes beyond the
    contour or the cap are unmeasured.  The XLA path keeps its own threshold
    (fp32 chain OOMs from N=258 at B=32): 160.
    """
    import math

    flagship_budget = 64 * 256 * 256 * 64 * 15   # B * N^2 * H * L (measured fit)
    denom = max(int(batch_size), 1) * max(int(attention_heads), 1) * max(
        int(encoder_layers), 1
    )
    bound = math.isqrt(flagship_budget // denom)
    return min(320, bound + 1)


def _unfreeze_dict(tree):
    if isinstance(tree, dict):
        return {k: _unfreeze_dict(v) for k, v in tree.items()}
    return tree


class NNModel:
    def __init__(self, data_train: Dict[str, Any], data_test: Dict[str, Any], trainer: Trainer, **params):
        self.data_train = data_train
        self.data_test = data_test
        self.trainer = trainer
        self.task = params["task"]
        self.num_classes = data_train.get("num_classes")
        self.target_scaler = data_train.get("target_scaler")
        self.features_train = data_train["unimol_input"]
        self.features_test = data_test["unimol_input"]
        self.loss_key = params.get("loss_key", None)
        self.data_type = params.get("data_type", "molecule")
        self.using_ct = params.get("using_ct", False)
        self.using_infonce = params.get("using_infonce", False)
        if self.data_type == "mof" and self.using_infonce:
            raise ValueError(
                "using_infonce=True is not applicable to data_type='mof': "
                "MOF samples have no SMILES stream to align (MOFModel, "
                "models/mof.py)"
            )
        self.use_weight = params.get("use_weight", False)
        self.use_fds = params.get("fds", False)
        self.fds_num = params.get("fds_num", 30)
        self.save_path = trainer.save_path
        # checkpoints the experiment dir holds: 1 (reference behavior) or the
        # CV fold count — written by MolTrain.update_and_save_config, read by
        # evaluate() for fold ensembling (missing in pre-CV config.yaml = 1)
        self.model_folds = int(params.get("model_folds", 1) or 1)
        self.cv: Dict[str, Any] = {}

        # dictionaries / tokenizer ------------------------------------------------
        unimol_dir = params.get("unimol_dir", "") or ""
        dict_path = None
        if unimol_dir:
            cand = os.path.join(os.path.dirname(unimol_dir), "mol.dict.txt")
            dict_path = cand if os.path.exists(cand) else None
        self.dictionary = Dictionary.load(dict_path)
        self.dictionary.add_symbol("[MASK]", is_special=True)
        self.tokenizer = load_tokenizer(params.get("chemberta_dir", "") or None)

        # output dim / losses -----------------------------------------------------
        self.output_dim = resolve_output_dim(
            self.task, self.num_classes, data_train.get("multiclass_cnt")
        )
        self.loss_func = resolve_loss(self.task, self.loss_key)
        self.activation_fn = ACTIVATION_REGISTRY[self.task]

        # GHM keeps EMA bin counts across steps (reference GHM_Loss module
        # state, models/loss.py:81-85) — threaded explicitly through the jit'd
        # train step as (bins, initialized-flag) loss state.
        self.stateful_loss = None
        self.loss_state = None
        if self.task == "multilabel_classification" and self.loss_key == "ghm":
            from mmdti_tpu.losses import zoo

            def ghm_stateful(logits, labels, state):
                bins_arr, flag = state
                loss_ema, bins_ema = zoo.ghmc_loss(logits, labels, bins_arr, bins=10, alpha=0.5)
                loss_raw, bins_raw = zoo.ghmc_loss(logits, labels, None, bins=10, alpha=0.5)
                use_ema = flag > 0
                loss = jnp.where(use_ema, loss_ema, loss_raw)
                new_bins = jnp.where(use_ema, bins_ema, bins_raw)
                return loss, (new_bins, jnp.ones((), jnp.float32))

            self.stateful_loss = ghm_stateful
            self.loss_state = (jnp.zeros((10,), jnp.float32), jnp.zeros((), jnp.float32))

        # static pad shapes across train+test (one XLA compilation) ---------------
        pad_multiple = int(params.get("pad_multiple", 16))
        pad_mode = params.get("pad_mode", "dataset")
        if pad_mode == "fixed":
            # config-wide constants, independent of the dataset: every run
            # with the same config compiles the same shapes (stable compile
            # cache across datasets); atoms can never exceed max_atoms+2
            # (BOS/EOS, featurizer crop), SMILES are truncated by the
            # collator at smiles_pad_len
            def _up(n):
                return int(-(-n // pad_multiple) * pad_multiple)

            self.atom_pad = _up(int(params.get("max_atoms", 256)) + 2)
            self.smiles_pad = _up(int(params.get("smiles_pad_len", 128)))
        else:
            self.atom_pad, self.smiles_pad = dataset_pad_lengths(
                self.features_train, self.tokenizer, pad_multiple,
                extra_datasets=[self.features_test],
            )
        # Pair-feature placement ('auto'): on TPU the [B,N,N] distance/edge
        # arrays are reconstructed on device from [B,N,3] coords inside the
        # jit (ops/pair_feats.py) — ~40x fewer host->device bytes per batch
        # and no O(N^2) host padding; CPU (the numerics oracle) keeps the
        # host arrays.  Both paths are value-identical (tests/test_pair_feats.py).
        from mmdti_tpu.ops.pair_feats import resolve_pair_feats_mode

        pair_feats = resolve_pair_feats_mode(params.get("device_pair_feats", "auto"))
        # The featurizer has its own knob (ConformerGen pair_feats=False skips
        # the O(N^2) host arrays entirely — smaller conformer caches).  Such
        # features can only be collated in device mode: honor them rather
        # than KeyError on the first batch.
        probe_feat = (self.features_train or self.features_test or [None])[0]
        if (
            pair_feats == "host"
            and isinstance(probe_feat, dict)
            and "src_distance" not in probe_feat
        ):
            logger.info(
                "features were built without host pair arrays "
                "(pair_feats=False); switching the collator to device-side "
                "pair featurization"
            )
            pair_feats = "device"
        self.collator = BatchCollator(
            self.tokenizer,
            pad_idx=self.dictionary.pad(),
            pad_mode=params.get("pad_mode", "dataset"),
            atom_pad=self.atom_pad,
            smiles_pad=self.smiles_pad,
            pair_feats=pair_feats,
        )

        # model --------------------------------------------------------------------
        # Attention path policy ('auto'): the fused Pallas fwd+bwd kernels
        # (token-major I/O, VMEM softmax/dropout, bf16 pair-logit storage)
        # measured 22.97ms/step vs 35.4ms for the XLA chain at the flagship
        # shapes (honest queue-saturated timing, scripts/perf_probe.py), so
        # TPU uses Pallas; other backends (CPU tests, virtual-device meshes)
        # use the XLA oracle path, which is also the numerics reference
        # (tests/test_pallas.py validates the kernels against it).
        use_pallas = params.get("use_pallas", "auto")
        if use_pallas == "auto":
            train_pallas = infer_pallas = jax.default_backend() == "tpu"
        else:
            train_pallas = infer_pallas = bool(use_pallas)

        # Auto-remat the encoder for long atom sequences.  On the XLA path
        # the fp32 activations OOM at N=258/batch 32 without remat (measured
        # round 1).  The Pallas path stores the chain bf16 and keeps the
        # softmax pipeline in VMEM: measured at N=256/batch 32 it fits AND
        # runs 16% faster WITHOUT remat (148 vs 177ms/step), so its
        # threshold sits above the reference max_atoms regime.  Larger
        # batches shrink the window along the measured B*N^2 memory contour
        # (pallas_remat_threshold); explicit unimol_overrides always win.
        unimol_overrides = dict(params["unimol_overrides"]) if params.get("unimol_overrides") else {}
        # gate on whether the kernels actually ENGAGE at this pad (not just
        # the flag): a non-%8 pad silently takes the XLA path, which still
        # needs its OOM protection
        from mmdti_tpu.configs.architectures import UniMolEncoderConfig
        from mmdti_tpu.ops.pallas_attention import pallas_attention_supported

        _probe_cfg = UniMolEncoderConfig(
            **{k: v for k, v in unimol_overrides.items() if k != "remat"}
        )
        _bs = int(getattr(self.trainer, "batch_size", 32))
        pallas_engaged = train_pallas and pallas_attention_supported(
            _probe_cfg.attention_heads, _probe_cfg.head_dim, self.atom_pad,
            batch=_bs,
        )
        if pallas_engaged:
            # the remat decision tracks PER-CHIP HBM: under the mesh each
            # chip holds batch/dp rows AND heads/mp heads of the pair-logit
            # chain, so global counts would overestimate residency by the
            # mesh size and flip remat on (a measured ~20% step cost,
            # docs/PERF.md) on runs whose per-chip window is fine
            _dp = _mp = 1
            _mesh = getattr(self.trainer, "mesh", None)
            if _mesh is not None:
                from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

                _dp = int(_mesh.shape[DATA_AXIS])
                _mp = int(_mesh.shape[MODEL_AXIS])
            remat_threshold = pallas_remat_threshold(
                max(1, _bs // _dp),
                max(1, _probe_cfg.attention_heads // _mp),
                _probe_cfg.encoder_layers,
            )
        else:
            remat_threshold = 160
        if "remat" not in unimol_overrides and self.atom_pad >= remat_threshold:
            unimol_overrides["remat"] = True
            logger.info("Auto-enabled encoder rematerialization (atom_pad=%d)", self.atom_pad)
        # bf16 pair-logit storage halves the threaded-chain HBM traffic inside
        # the Pallas kernels (softmax/accumulation stay fp32, mirroring the
        # reference's fp16-AMP envelope for these tensors); fp32 elsewhere.
        if "pair_dtype" not in unimol_overrides:
            unimol_overrides["pair_dtype"] = (
                "bfloat16" if train_pallas else "float32"
            )

        # HF checkpoint dims flow into the built model (ChemBertaConfig
        # docstring contract); explicit user overrides win
        chemberta_overrides = (
            dict(params["chemberta_overrides"]) if params.get("chemberta_overrides") else {}
        )
        cb_dir = params.get("chemberta_dir", "") or ""
        if cb_dir and os.path.isdir(cb_dir):
            from mmdti_tpu.models.convert import hf_chemberta_overrides

            chemberta_overrides = {**hf_chemberta_overrides(cb_dir), **chemberta_overrides}

        def _build(pallas_flag):
            if self.data_type == "mof":
                from mmdti_tpu.models.mof import build_mof_model

                return build_mof_model(
                    output_dim=self.output_dim,
                    atom_vocab_size=len(self.dictionary),
                    atom_pad_idx=self.dictionary.pad(),
                    task=self.task,
                    use_fds=self.use_fds,
                    fds_num=self.fds_num,
                    compute_dtype=params.get("compute_dtype", "bfloat16"),
                    use_pallas=pallas_flag,
                    unimol_overrides=unimol_overrides or None,
                    mof_overrides=dict(params["mof_overrides"]) if params.get("mof_overrides") else None,
                )
            return build_model(
                output_dim=self.output_dim,
                atom_vocab_size=len(self.dictionary),
                atom_pad_idx=self.dictionary.pad(),
                task=self.task,
                smiles_vocab_size=getattr(self.tokenizer, "vocab_size", 600),
                use_fds=self.use_fds,
                fds_num=self.fds_num,
                compute_dtype=params.get("compute_dtype", "bfloat16"),
                use_pallas=pallas_flag,
                unimol_overrides=unimol_overrides or None,
                chemberta_overrides=chemberta_overrides or None,
                crossmodal_overrides=dict(params["crossmodal_overrides"]) if params.get("crossmodal_overrides") else None,
            )

        self.model = _build(train_pallas)
        # same param tree, Pallas attention inner op — used for eval/serving
        self.model_infer = self.model if infer_pallas == train_pallas else _build(infer_pallas)
        if params.get("evaluate_only"):
            # MolPredict path: evaluate() restores the best checkpoint, which
            # would overwrite anything initialized here — skip the expensive
            # model.init jit and the pretrained torch/HF checkpoint ingestion
            # whose results are discarded (freezing is train-only).
            self.params = None
            self.frozen_mask = None
        else:
            self.params = self._init_params(params)
            n_params = sum(x.size for x in jax.tree.leaves(self.params))
            logger.info("Number of trainable parameters: %d", n_params)

            # freezing --------------------------------------------------------------
            self.frozen_mask = self._build_frozen_mask(
                params.get("freeze_layers"), params.get("freeze_layers_reversed", False),
                params.get("freeze_module"),
            )

        # FDS -----------------------------------------------------------------------
        self.fds_state = None
        self.fds_bucket = (0.0, 1.0)
        self.fds_kernel = None
        if self.use_fds and self.task == "regression":
            raw_path = params.get("fds_raw_path", "") or params.get("raw_data", "")
            col = params.get("fds_col_data", "") or (data_train["target_cols"][0])
            if raw_path and os.path.exists(raw_path):
                raw_vals = pd.read_csv(raw_path)[col].values
            else:
                raw_vals = np.asarray(data_train["raw_target"]).reshape(-1)
            self.fds_bucket = fds_bucket_params(
                raw_vals, self.fds_num, using_scale=params.get("use_scaler", True)
            )
            self.fds_state = init_fds_state(self.model.fds_cfg)
            self.fds_kernel = fds_kernel_window(
                self.model.fds_cfg.kernel, self.model.fds_cfg.ks, self.model.fds_cfg.sigma
            )

    # ------------------------------------------------------------------
    def _dummy_batch(self):
        sample = [(self.features_train[0], np.zeros(max(1, self.output_dim)))]
        batch, _ = self.collator(sample)
        return {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k in ("src_tokens", "src_distance", "src_edge_type", "src_coord",
                     "input_ids", "attention_mask",
                     "gas_id", "gas_attr", "pressure", "temperature")
        }

    def _init_params(self, params):
        rng = jax.random.PRNGKey(self.trainer.seed)
        variables = self.model.init(
            {"params": rng, "dropout": rng}, **self._dummy_batch(), deterministic=True
        )
        tree = _unfreeze_dict(jax.tree.map(np.asarray, variables["params"]))
        tree = load_pretrained(
            tree,
            unimol_dir=params.get("unimol_dir") or None,
            # MOFModel has no ChemBERTa stream to ingest into
            chemberta_dir=(params.get("chemberta_dir") or None)
            if self.data_type != "mof" else None,
        )
        return tree

    def _build_frozen_mask(self, freeze_layers, reversed_sel: bool, freeze_module):
        prefixes = []
        if isinstance(freeze_layers, str):
            prefixes = [p for p in freeze_layers.replace(" ", "").split(",") if p]
        elif isinstance(freeze_layers, list):
            prefixes = list(freeze_layers)
        modules = []
        if isinstance(freeze_module, str):
            modules = [m for m in freeze_module.replace(" ", "").split(",") if m]
        elif isinstance(freeze_module, list):
            modules = list(freeze_module)
        if not prefixes and not modules:
            return None

        def frozen(path) -> bool:
            name = ".".join(str(getattr(p, "key", p)) for p in path)
            hit = any(name.startswith(pref) for pref in prefixes)
            if reversed_sel:
                hit = not hit
            if modules and name.split(".")[0] in modules:
                hit = True
            return hit

        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        leaves = [frozen(path) for path, _ in flat]
        treedef = jax.tree_util.tree_structure(self.params)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # ------------------------------------------------------------------
    def run(self):
        logger.info("start training MM-DTI TPU model")
        y_train = np.asarray(self.data_train["target"])
        y_valid = np.asarray(self.data_test["target"])
        traindataset = MolDataset(self.features_train, y_train)
        validdataset = MolDataset(self.features_test, y_valid)

        y_pred = self.trainer.fit_predict(
            self.model, self.params, traindataset, validdataset,
            self.loss_func, self.activation_fn, self.save_path, 0, self.target_scaler,
            self.collator,
            use_infonce=self.using_infonce,
            use_ct=self.using_ct,
            use_weight=self.use_weight,
            fds_state=self.fds_state,
            fds_bucket=self.fds_bucket,
            fds_kernel=self.fds_kernel,
            fds_start_update=self.model.fds_cfg.start_update if self.fds_state is not None else 0,
            frozen_mask=self.frozen_mask,
            stateful_loss=self.stateful_loss,
            loss_state=self.loss_state,
        )

        self._log_fold_metric(0, y_valid, y_pred)
        self.cv["pred"] = y_pred
        return y_pred

    def run_cv(self, splits):
        """K-fold cross-validation over the training data.

        splits: list of (train_idx, val_idx) pairs (MolTrain._cv_splits).
        Every fold starts from the SAME initial parameters (self.params — the
        host tree is never mutated; fit_predict places a device copy) and
        fresh FDS/loss state, trains against its held-out slice, and saves
        model_{fold}.ckpt.  Returns out-of-fold predictions in dataset order
        (every row predicted exactly once, by the model that never saw it).

        The reference cannot do this: its NNModel.run hardcodes fold 0
        (/root/reference/models/nnmodel.py:156-199) even though MolTrain
        exposes a kfold kwarg (/root/reference/train.py:90).
        """
        y_all = np.asarray(self.data_train["target"])
        feats = self.features_train
        oof = None
        for fold, (tr_idx, va_idx) in enumerate(splits):
            traindataset = MolDataset([feats[i] for i in tr_idx], y_all[tr_idx])
            validdataset = MolDataset([feats[i] for i in va_idx], y_all[va_idx])
            y_pred = self.trainer.fit_predict(
                self.model, self.params, traindataset, validdataset,
                self.loss_func, self.activation_fn, self.save_path, fold,
                self.target_scaler, self.collator,
                use_infonce=self.using_infonce,
                use_ct=self.using_ct,
                use_weight=self.use_weight,
                fds_state=self.fds_state,
                fds_bucket=self.fds_bucket,
                fds_kernel=self.fds_kernel,
                fds_start_update=self.model.fds_cfg.start_update
                if self.fds_state is not None else 0,
                frozen_mask=self.frozen_mask,
                stateful_loss=self.stateful_loss,
                loss_state=self.loss_state,
            )
            if oof is None:
                oof = np.zeros((len(y_all),) + y_pred.shape[1:], dtype=y_pred.dtype)
            oof[np.asarray(va_idx)] = y_pred
            self._log_fold_metric(fold, y_all[va_idx], y_pred)
        self._log_fold_metric("cv (out-of-fold)", y_all, oof)
        self.cv["pred"] = oof
        return oof

    def _log_fold_metric(self, fold, y_true, y_pred) -> None:
        label_cnt = self.data_train.get("multiclass_cnt")
        scaler = self.target_scaler
        if scaler is not None and scaler.scaler is not None:
            score = self.trainer.metrics.cal_metric(
                scaler.inverse_transform(y_true), scaler.inverse_transform(y_pred),
                label_cnt=label_cnt,
            )
        else:
            score = self.trainer.metrics.cal_metric(y_true, y_pred, label_cnt=label_cnt)
        logger.info("fold %s, result %s", fold, score)

    def evaluate(self, trainer: Optional[Trainer] = None, checkpoints_path: Optional[str] = None):
        """Best-checkpoint inference on the test features.

        A CV experiment (config model_folds > 1) is an ensemble: every
        model_{fold}.ckpt predicts and the activation outputs are averaged
        (probability space for classification; scaled-label space for
        regression — the inverse transform happens once, in MolPredict).
        The fold count comes from the saved config, never from globbing, so
        stale checkpoints in a reused experiment dir are ignored.
        """
        logger.info("start predict MM-DTI TPU model")
        trainer = trainer or self.trainer
        testdataset = MolDataset(self.features_test, np.asarray(self.data_test["target"]))
        # bulk inference uses the device-resident sweep when it fits: ONE
        # scan dispatch per fold + one batched pull instead of per-batch
        # collation, transfer, and dispatch (same gate as the fit loop's
        # device_feed); the resident arrays + compiled sweep are shared
        # across folds — only the params change
        device_data = None
        if trainer._feed_engaged(self.collator, testdataset):
            device_data = trainer.build_eval_device_data(
                self.model_infer, testdataset, self.collator,
                self.loss_func, self.activation_fn,
            )
        if self.model_folds > 1:
            logger.info("ensembling %d fold checkpoints", self.model_folds)
        fold_preds = []
        for fold in range(max(1, self.model_folds)):
            # load each checkpoint exactly once and hand the placed params to
            # predict (load_model=True would restore the same file again)
            ckpt = load_checkpoint(checkpoints_path, fold)
            self.params = trainer._place_params(ckpt["params"])
            logger.info("load model success!")
            y_pred, _, _ = trainer.predict(
                self.model_infer, self.params, testdataset, self.loss_func,
                self.activation_fn, checkpoints_path, fold, self.target_scaler,
                self.collator, load_model=False, skip_metrics=True,
                device_data=device_data,
            )
            fold_preds.append(y_pred)
        y_pred = (
            np.mean(np.stack(fold_preds), axis=0)
            if len(fold_preds) > 1 else fold_preds[0]
        )
        self.cv["test_pred"] = y_pred
        return y_pred
