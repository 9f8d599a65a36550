"""Torch -> flax weight ingestion.

The reference loads two pretrained checkpoints: a Uni-Mol unicore ``.pt``
(strict=False, /root/reference/models/mm_model.py:499-514) and an HF ChemBERTa
via ``AutoModel.from_pretrained`` (mm_model.py:475).  These converters map the
torch state dicts onto this framework's flax param trees.  Missing / shape-
mismatched entries are skipped with a log line (strict=False parity); torch is
only imported when a checkpoint is actually supplied.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from mmdti_tpu.utils.logger import logger


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _assign(params: Dict[str, Any], path, value: np.ndarray, stats) -> None:
    node = params
    for key in path[:-1]:
        if key not in node:
            stats["missing"].append("/".join(path))
            return
        node = node[key]
    leaf = path[-1]
    if leaf not in node:
        stats["missing"].append("/".join(path))
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        stats["shape"].append(f"{'/'.join(path)}: {node[leaf].shape} vs {value.shape}")
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    stats["loaded"] += 1


def _linear(params, prefix_path, torch_sd, torch_name, stats):
    if f"{torch_name}.weight" in torch_sd:
        _assign(params, prefix_path + ["kernel"], _t(torch_sd[f"{torch_name}.weight"]).T, stats)
    if f"{torch_name}.bias" in torch_sd:
        _assign(params, prefix_path + ["bias"], _t(torch_sd[f"{torch_name}.bias"]), stats)


def _layernorm(params, prefix_path, torch_sd, torch_name, stats):
    if f"{torch_name}.weight" in torch_sd:
        _assign(params, prefix_path + ["scale"], _t(torch_sd[f"{torch_name}.weight"]), stats)
    if f"{torch_name}.bias" in torch_sd:
        _assign(params, prefix_path + ["bias"], _t(torch_sd[f"{torch_name}.bias"]), stats)


def _ln_fp32(params, prefix_path, torch_sd, torch_name, stats):
    # LayerNormFP32 nests an 'ln' LayerNorm
    _layernorm(params, prefix_path + ["ln"], torch_sd, torch_name, stats)


def convert_unimol_checkpoint(state_dict: Dict[str, Any], params: Dict[str, Any]) -> Dict[str, Any]:
    """Map a Uni-Mol unicore checkpoint ('model' state dict) onto the MMModel
    param tree (embed_tokens, gbf, gbf_proj, encoder, classification_head)."""
    sd = state_dict.get("model", state_dict)
    sd = {k.replace("unimat.", ""): v for k, v in sd.items()}
    stats = {"loaded": 0, "missing": [], "shape": []}

    if "embed_tokens.weight" in sd:
        _assign(params, ["embed_tokens", "embedding"], _t(sd["embed_tokens.weight"]), stats)
    for name, path in (
        ("gbf.means.weight", ["gbf", "means"]),
        ("gbf.stds.weight", ["gbf", "stds"]),
    ):
        if name in sd:
            _assign(params, path, _t(sd[name]).reshape(-1), stats)
    for name, path in (
        ("gbf.mul.weight", ["gbf", "mul"]),
        ("gbf.bias.weight", ["gbf", "bias"]),
    ):
        if name in sd:
            _assign(params, path, _t(sd[name]), stats)
    _linear(params, ["gbf_proj", "linear1"], sd, "gbf_proj.linear1", stats)
    _linear(params, ["gbf_proj", "linear2"], sd, "gbf_proj.linear2", stats)

    enc = ["encoder"]
    _ln_fp32(params, enc + ["emb_layer_norm"], sd, "encoder.emb_layer_norm", stats)
    _ln_fp32(params, enc + ["final_layer_norm"], sd, "encoder.final_layer_norm", stats)
    n_layers = 0
    while f"encoder.layers.{n_layers}.fc1.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        p = enc + [f"layers_{i}"]
        t = f"encoder.layers.{i}"
        _linear(params, p + ["in_proj"], sd, f"{t}.self_attn.in_proj", stats)
        _linear(params, p + ["out_proj"], sd, f"{t}.self_attn.out_proj", stats)
        _ln_fp32(params, p + ["self_attn_layer_norm"], sd, f"{t}.self_attn_layer_norm", stats)
        _ln_fp32(params, p + ["final_layer_norm"], sd, f"{t}.final_layer_norm", stats)
        _linear(params, p + ["fc1"], sd, f"{t}.fc1", stats)
        _linear(params, p + ["fc2"], sd, f"{t}.fc2", stats)

    _linear(params, ["classification_head", "dense"], sd, "classification_head.dense", stats)
    _linear(params, ["classification_head", "out_proj"], sd, "classification_head.out_proj", stats)
    logger.info(
        "Uni-Mol checkpoint: %d tensors loaded, %d missing, %d shape-mismatched",
        stats["loaded"], len(stats["missing"]), len(stats["shape"]),
    )
    for m in stats["shape"][:5]:
        logger.info("  shape mismatch: %s", m)
    # strict=False parity tolerates partial overlap (the reference skips the
    # pretraining heads the same way), but a ZERO-tensor load means the name
    # map has drifted and the model would silently train from scratch — that
    # must be loud.
    if sd and stats["loaded"] == 0:
        sample = sorted(sd)[:5]
        raise ValueError(
            "Uni-Mol checkpoint ingestion loaded 0 tensors out of "
            f"{len(sd)} checkpoint entries — the name map does not match this "
            f"checkpoint (sample keys: {sample}). Refusing to silently train "
            "from scratch."
        )
    return params


def convert_hf_roberta(state_dict: Dict[str, Any], bert_params: Dict[str, Any]) -> Dict[str, Any]:
    """Map an HF RoBERTa/ChemBERTa state dict onto the ChemBerta subtree."""
    sd = {k.removeprefix("roberta."): v for k, v in state_dict.items()}
    stats = {"loaded": 0, "missing": [], "shape": []}

    for name, path in (
        ("embeddings.word_embeddings.weight", ["embeddings", "word_embeddings", "embedding"]),
        ("embeddings.position_embeddings.weight", ["embeddings", "position_embeddings", "embedding"]),
        ("embeddings.token_type_embeddings.weight", ["embeddings", "token_type_embeddings", "embedding"]),
    ):
        if name in sd:
            _assign(bert_params, path, _t(sd[name]), stats)
    _layernorm(bert_params, ["embeddings", "LayerNorm"], sd, "embeddings.LayerNorm", stats)

    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = [f"layer_{i}"]
        t = f"encoder.layer.{i}"
        _linear(bert_params, p + ["attn_query"], sd, f"{t}.attention.self.query", stats)
        _linear(bert_params, p + ["attn_key"], sd, f"{t}.attention.self.key", stats)
        _linear(bert_params, p + ["attn_value"], sd, f"{t}.attention.self.value", stats)
        _linear(bert_params, p + ["attn_output"], sd, f"{t}.attention.output.dense", stats)
        _layernorm(bert_params, p + ["attn_LayerNorm"], sd, f"{t}.attention.output.LayerNorm", stats)
        _linear(bert_params, p + ["intermediate"], sd, f"{t}.intermediate.dense", stats)
        _linear(bert_params, p + ["output"], sd, f"{t}.output.dense", stats)
        _layernorm(bert_params, p + ["output_LayerNorm"], sd, f"{t}.output.LayerNorm", stats)
        i += 1
    logger.info(
        "ChemBERTa checkpoint: %d tensors loaded, %d missing, %d shape-mismatched",
        stats["loaded"], len(stats["missing"]), len(stats["shape"]),
    )
    # Same loud-failure contract as the Uni-Mol converter: a zero-tensor
    # load (every tensor shape-mismatch-skipped, e.g. hidden_size of the
    # checkpoint differs from the built model) means the user's pretrained
    # weights were silently discarded.
    if sd and stats["loaded"] == 0:
        sample = sorted(stats["shape"])[:5] or sorted(sd)[:5]
        raise ValueError(
            "ChemBERTa checkpoint ingestion loaded 0 tensors out of "
            f"{len(sd)} checkpoint entries — dims or names do not match the "
            f"built model (sample: {sample}). Pass matching "
            "chemberta_overrides (or rely on the config.json auto-read) "
            "instead of silently training from scratch."
        )
    return bert_params


def hf_chemberta_overrides(chemberta_dir: str) -> Dict[str, Any]:
    """ChemBertaConfig fields read from an HF checkpoint's config.json.

    Makes the dataclass docstring's promise real ("loading an HF checkpoint
    overrides them from its config.json"): the built model's dims follow the
    checkpoint so the tensor ingestion cannot shape-mismatch-skip everything.
    Explicit user chemberta_overrides still win (merged on top by callers).
    """
    import json

    path = os.path.join(chemberta_dir, "config.json")
    if not os.path.isfile(path):
        return {}
    try:
        with open(path, encoding="utf-8") as f:
            hf = json.load(f)
    except Exception as e:
        logger.info("Unreadable HF config.json at %s (%s); using defaults.", path, e)
        return {}
    keys = (
        "vocab_size", "hidden_size", "num_hidden_layers", "num_attention_heads",
        "intermediate_size", "hidden_act", "hidden_dropout_prob",
        "attention_probs_dropout_prob", "max_position_embeddings",
        "type_vocab_size", "layer_norm_eps", "pad_token_id",
    )
    return {k: hf[k] for k in keys if k in hf}


def load_pretrained(
    params: Dict[str, Any],
    unimol_dir: Optional[str] = None,
    chemberta_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Best-effort pretrained loading into a mutable (dict) param tree."""
    if unimol_dir and os.path.exists(unimol_dir):
        import torch

        logger.info("Loading Uni-Mol pretrained weights from %s", unimol_dir)
        sd = torch.load(unimol_dir, map_location="cpu", weights_only=False)
        params = convert_unimol_checkpoint(sd, params)
    if chemberta_dir and os.path.isdir(chemberta_dir):
        try:
            from transformers import AutoModel

            logger.info("Loading ChemBERTa pretrained weights from %s", chemberta_dir)
            model = AutoModel.from_pretrained(chemberta_dir)
        except Exception as e:  # environment problems (no transformers, bad dir)
            logger.info("ChemBERTa load failed (%s); training from scratch.", e)
        else:
            # a dimension/name mismatch raises out of the converter — that is
            # a user error to surface, not an environment condition to swallow
            params["bert"] = convert_hf_roberta(model.state_dict(), params["bert"])
    return params
