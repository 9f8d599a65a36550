"""Configuration tree for the framework.

Replaces the reference's three-tier addict/argparse config stack
(/root/reference/train.py:107-149, /root/reference/config/default.yaml,
/root/reference/models/mm_model.py:325-377) with one attribute-dict type,
YAML round-trip IO, and explicit defaults.  The saved ``config.yaml`` artifact
contract is preserved: MolTrain writes it to the experiment dir and MolPredict
reloads it verbatim.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


class Config(dict):
    """Dict with attribute access, nested-aware (lightweight addict stand-in)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in list(args) + [kwargs]:
            if src is None:
                continue
            for k, v in dict(src).items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
        super().__setitem__(key, value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get(self, key, default=None):
        return super().get(key, default)

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def update_from(self, other: Dict[str, Any]) -> "Config":
        for k, v in other.items():
            self[k] = v
        return self


# Base trainer/data hyperparameters.  Mirrors the semantics of
# /root/reference/config/default.yaml (warmup_ratio 0.03 overriding the code
# default, batch_size, max_norm 5.0, ...), adapted for TPU: bf16 mixed
# precision replaces fp16 AMP + GradScaler.
DEFAULT_CONFIG: Dict[str, Any] = {
    # data
    "smiles_col": "SMILES",
    "target_col_prefix": "TARGET",
    "target_normalize": "auto",
    "anomaly_clean": True,
    "smi_strict": False,
    # model
    "model_name": "mm_model",
    # trainer
    "split_method": "5fold_random",
    "split_seed": 42,
    "seed": 42,
    "logger_level": 1,
    "patience": 10,
    "max_epochs": 100,
    "learning_rate": 1e-4,
    "warmup_ratio": 0.03,
    "batch_size": 16,
    "max_norm": 5.0,
    "cuda": True,   # kept for config-file compatibility; ignored on TPU
    "amp": True,    # on TPU this selects bf16 compute, fp32 params
    # TPU-native additions
    "compute_dtype": "bfloat16",
    "pad_mode": "dataset",      # 'dataset' | 'bucket' | 'fixed'
    "pad_multiple": 16,
    "num_workers": 0,
    "prefetch": 2,
    "mesh_shape": None,          # None => all devices on the data axis
    "use_pallas": "auto",        # 'auto' | True | False
}


def default_config() -> Config:
    return Config(copy.deepcopy(DEFAULT_CONFIG))


def load_yaml(path: str) -> Config:
    with open(path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    return Config(data or {})


def save_yaml(cfg: Dict[str, Any], path: str) -> None:
    data = cfg.to_dict() if isinstance(cfg, Config) else dict(cfg)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)


class YamlHandler:
    """Read/write YAML configs (API parity with the reference's YamlHandler,
    /root/reference/utils/config_handler.py:15-55)."""

    def __init__(self, file_path: str):
        self.file_path = file_path

    def read_yaml(self) -> Config:
        return load_yaml(self.file_path)

    def write_yaml(self, data: Dict[str, Any], out_file_path: str) -> None:
        save_yaml(data, out_file_path)
