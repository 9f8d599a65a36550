"""Per-task loss / activation / output-dim registries.

Mirrors the reference's registries (models/nnmodel.py:20-49): loss per task
(multilabel_classification selectable via loss_key), activation applied at
predict time (classification drops column 0 after softmax), and output-dim
resolution.
"""

from __future__ import annotations

from typing import Callable

import jax

from mmdti_tpu.losses import zoo


def _focal(logits, target):
    return zoo.focal_loss_with_logits(logits, target)


_focal.nan_maskable = True


def _ghm(logits, target):
    loss, _ = zoo.ghmc_loss(logits, target)
    return loss


LOSS_REGISTRY = {
    "classification": zoo.cross_entropy_loss,
    "multiclass": zoo.cross_entropy_loss,
    "regression": zoo.mse_loss,
    "multilabel_classification": {
        "bce": zoo.bce_with_logits,
        "ghm": _ghm,
        "focal": _focal,
    },
    "multilabel_regression": zoo.mae_with_nan,
}

ACTIVATION_REGISTRY: dict[str, Callable] = {
    "classification": lambda x: jax.nn.softmax(x, axis=-1)[:, 1:],
    "multiclass": lambda x: jax.nn.softmax(x, axis=-1),
    "regression": lambda x: x,
    "multilabel_classification": jax.nn.sigmoid,
    "multilabel_regression": lambda x: x,
}

OUTPUT_DIM = {"classification": 2, "regression": 1}


def resolve_loss(task: str, loss_key=None) -> Callable:
    entry = LOSS_REGISTRY[task]
    if isinstance(entry, dict):
        return entry[loss_key or "focal"]
    return entry


def resolve_output_dim(task: str, num_classes=None, multiclass_cnt=None) -> int:
    if task in OUTPUT_DIM:
        return OUTPUT_DIM[task]
    if task == "multiclass":
        return int(multiclass_cnt)
    return int(num_classes)


def target_is_integer(task: str) -> bool:
    """Whether device labels are int32.  multilabel_classification stays
    float32: its losses are NaN-maskable (bce/ghm/focal test jnp.isnan, the
    reference's missing-label semantics, models/loss.py:180-231) and an int
    cast would destroy the NaN mask — or crash outright on NaN labels."""
    return task in ("classification", "multiclass")
