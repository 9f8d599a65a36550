"""Resident-model loading for MolServe (split out of serve_api.py).

Builds the flax model from a trained experiment dir's config, loads the fold
checkpoint(s) into device-resident params (sharded per the serving mesh),
and returns the jit'd forward/embed callables.  Fold ensembles are served as
leaf-wise stacked params with a vmapped forward — one dispatch returns the
MolPredict-identical fold-mean (activated outputs averaged).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mmdti_tpu.losses.registry import ACTIVATION_REGISTRY, resolve_output_dim
from mmdti_tpu.models.mm_model import build_model
from mmdti_tpu.train.trainer import load_checkpoint
from mmdti_tpu.data.scaler import TargetScaler
from mmdti_tpu.utils.logger import logger


@dataclass
class ResidentModel:
    model: Any
    params: Any                       # device-resident (stacked when folds>1)
    forward: Callable                 # jit'd (params, feats) -> activated preds
    embed: Callable                   # jit'd (params, feats) -> (cls_repr, pooled)
    activation_fn: Callable
    output_dim: int
    serve_folds: int
    use_pallas: bool


def chemberta_overrides(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Same dims as training: HF config.json fields (when chemberta_dir is
    set) under the explicit overrides — mirrors NNModel's merge so the
    checkpoint restores onto an identical param tree."""
    overrides = dict(cfg.get("chemberta_overrides") or {})
    cb_dir = cfg.get("chemberta_dir", "") or ""
    if cb_dir and os.path.isdir(cb_dir):
        from mmdti_tpu.models.convert import hf_chemberta_overrides

        overrides = {**hf_chemberta_overrides(cb_dir), **overrides}
    return overrides


def load_resident_model(
    load_model: str,
    cfg: Dict[str, Any],
    task: str,
    dictionary,
    tokenizer,
    mesh,
    use_pallas: Union[str, bool] = "auto",
    serve_folds: Union[str, int] = 1,
) -> ResidentModel:
    """Build the model + jit'd forwards and place the checkpoint on device."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    use_pallas = bool(use_pallas)
    unimol_overrides = dict(cfg.get("unimol_overrides") or {})
    unimol_overrides.setdefault(
        "pair_dtype", "bfloat16" if use_pallas else "float32"
    )
    output_dim = resolve_output_dim(
        task, cfg.get("num_classes"), cfg.get("multiclass_cnt")
    )
    activation = ACTIVATION_REGISTRY[task]
    model = build_model(
        output_dim=output_dim,
        atom_vocab_size=len(dictionary),
        atom_pad_idx=dictionary.pad(),
        task=task,
        smiles_vocab_size=getattr(tokenizer, "vocab_size", 600),
        use_fds=bool(cfg.get("fds", False)),
        fds_num=int(cfg.get("fds_num", 20) or 20),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        use_pallas=use_pallas,
        unimol_overrides=unimol_overrides,
        chemberta_overrides=chemberta_overrides(cfg) or None,
        crossmodal_overrides=dict(cfg["crossmodal_overrides"])
        if cfg.get("crossmodal_overrides")
        else None,
    )
    model_folds = int(cfg.get("model_folds", 1) or 1)
    k = model_folds if serve_folds == "all" else int(serve_folds)
    if k < 1 or k > model_folds:
        raise ValueError(
            f"serve_folds={serve_folds!r} but the experiment dir has "
            f"{model_folds} fold checkpoint(s)"
        )
    if model_folds > 1 and k == 1:
        # CV experiment dirs hold K fold checkpoints; the default keeps
        # the single-model latency contract and uses fold 0
        logger.info(
            "experiment dir has %s fold checkpoints; serving fold 0 "
            "(pass serve_folds='all' for the on-device ensemble, or use "
            "MolPredict for fold-averaged batch scoring)",
            model_folds,
        )
    if k == 1:
        params = load_checkpoint(load_model, 0)["params"]
        if mesh is not None:
            from mmdti_tpu.parallel.mesh import param_sharding

            # TP_RULES over 'model' (replication with model-dim 1) —
            # the same placement Trainer._place_params uses in training
            params = jax.device_put(params, param_sharding(mesh, params))
        else:
            params = jax.device_put(params)
    else:
        from mmdti_tpu.parallel.mesh import MODEL_AXIS

        if mesh is not None and int(mesh.shape[MODEL_AXIS]) > 1:
            # the fold axis shifts every kernel to rank 3, so the rank-2
            # TP_RULES specs would shard the wrong dim — refuse loudly
            raise ValueError(
                "serve_folds>1 with a tensor-parallel mesh (model axis > 1) "
                "is unsupported; use a pure-DP mesh_shape=(n, 1)"
            )
        # leaf-wise stack on host, ONE device_put: params gain a leading
        # [k] fold axis the vmapped forward maps over
        trees = [load_checkpoint(load_model, f)["params"] for f in range(k)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *trees)
        if mesh is not None:
            from mmdti_tpu.parallel.mesh import replicate

            params = replicate(mesh, stacked)
        else:
            params = jax.device_put(stacked)
        logger.info("serving a %d-fold on-device ensemble", k)

    # Params are ARGUMENTS, never closure constants: closing over them
    # embeds 74M weights in the HLO and blows the remote-compile request
    # limit (HTTP 413, docs/PERF.md).
    if k == 1:
        @jax.jit
        def _forward(params, feats):
            out = model.apply({"params": params}, **feats, deterministic=True)
            return activation(out["logits"])

        @jax.jit
        def _embed(params, feats):
            out = model.apply({"params": params}, **feats, deterministic=True)
            return out["cls_repr"], out["pooled"]
    else:
        @jax.jit
        def _forward(params, feats):
            def one_fold(p):
                out = model.apply({"params": p}, **feats, deterministic=True)
                return activation(out["logits"])

            # MolPredict's ensemble algebra exactly: mean of ACTIVATED
            # outputs over folds (train/nnmodel.py::evaluate); the
            # inverse target transform happens once, downstream
            return jnp.mean(jax.vmap(one_fold)(params), axis=0)

        @jax.jit
        def _embed(params, feats):
            # representations are per-model quantities, not ensemble
            # means — extract from fold 0 (a lazy in-jit slice)
            p0 = jax.tree.map(lambda x: x[0], params)
            out = model.apply({"params": p0}, **feats, deterministic=True)
            return out["cls_repr"], out["pooled"]

    return ResidentModel(
        model=model, params=params, forward=_forward, embed=_embed,
        activation_fn=activation, output_dim=output_dim, serve_folds=k,
        use_pallas=use_pallas,
    )


def postprocess_predictions(
    task: str,
    raw: np.ndarray,
    scaler: Optional[TargetScaler] = None,
    threshold: Union[float, np.ndarray] = 0.5,
    multiclass_cnt: Optional[int] = None,
) -> Dict[str, Any]:
    """Map activated model outputs to MolPredict's output contract
    (/root/reference/predict.py:63-87): regression outputs are
    inverse-scaled, classification probabilities are binarized with the
    stored threshold, multiclass takes the argmax over the class axis.

    Returns {"predict": ndarray, "proba": ndarray | None}.
    """
    raw = np.asarray(raw)
    if task == "multiclass":
        if multiclass_cnt is not None and raw.shape[-1] != multiclass_cnt:
            raise ValueError(
                f"multiclass output width {raw.shape[-1]} != multiclass_cnt {multiclass_cnt}"
            )
        return {"predict": np.argmax(raw, axis=-1).reshape(-1, 1), "proba": raw}
    if task in ("classification", "multilabel_classification"):
        return {"predict": (raw > threshold).astype(np.int64), "proba": raw}
    if scaler is not None and scaler.scaler is not None:
        raw = scaler.inverse_transform(raw)
    return {"predict": raw, "proba": None}
