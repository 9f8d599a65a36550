"""Task loss zoo (pure jnp).

Covers the reference loss surface (/root/reference/models/loss.py and the
registries at models/nnmodel.py:24-45): CE / MSE / RMSE, NaN-masked MAE & BCE,
masked BCE-with-logits, focal (plain + with-logits), GHM classification /
regression (EMA bin state threaded explicitly), plus per-task activation
functions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mse_loss(logits, target):
    return jnp.mean((logits.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def rmse_loss(logits, target, eps: float = 1e-6):
    return jnp.sqrt(mse_loss(logits, target) + eps)


def cross_entropy_loss(logits, target):
    """CE over class logits; integer targets flattened
    (reference myCrossEntropyLoss, loss.py:278-289)."""
    target = target.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, target[:, None], axis=1).mean()


def _bce_elementwise(x, y):
    return jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))


def bce_with_logits(logits, target):
    return jnp.mean(
        _bce_elementwise(logits.astype(jnp.float32), target.astype(jnp.float32))
    )


def masked_bce_with_logits(logits, target):
    """NaN targets -> excluded; only {0,1} targets contribute
    (reference MaskedBCEWithLogitsLoss, loss.py:180-199)."""
    y = target.astype(jnp.float32)
    y_f = jnp.where(jnp.isnan(y), -1.0, y)
    mask = ((y_f == 0.0) | (y_f == 1.0)).astype(jnp.float32)
    elem = _bce_elementwise(logits.astype(jnp.float32), jnp.where(mask > 0, y_f, 0.0))
    return (elem * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def mae_with_nan(logits, target):
    y = target.astype(jnp.float32)
    mask = ~jnp.isnan(y)
    diff = jnp.abs(logits.astype(jnp.float32) - jnp.where(mask, y, 0.0))
    return (diff * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def bce_with_nan(logits, target):
    y = target.astype(jnp.float32)
    mask = ~jnp.isnan(y)
    elem = _bce_elementwise(logits.astype(jnp.float32), jnp.where(mask, y, 0.0))
    return (elem * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def focal_loss_with_logits(logits, target, alpha: float = 0.25, gamma: float = 2.0):
    """Sigmoid focal loss over valid {0,1} targets, two-class expansion
    (reference FocalLossWithLogits + FocalLoss, loss.py:233-276)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    y = target.astype(jnp.float32)
    y_safe = jnp.where(jnp.isnan(y), -1.0, y)
    mask = ((y_safe == 0.0) | (y_safe == 1.0)).astype(jnp.float32)
    y_v = jnp.where(mask > 0, y_safe, 0.0)
    p1 = jnp.clip(p, 1e-5, 1.0)
    p0 = jnp.clip(1.0 - p, 1e-5, 1.0)
    per = -alpha * (y_v * (1 - p1) ** gamma * jnp.log(p1)
                    + (1 - y_v) * (1 - p0) ** gamma * jnp.log(p0))
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# NaN-targets-are-excluded losses: padded eval rows can be masked exactly by
# setting their labels to NaN (used by Trainer.build_eval_step).
for _fn in (masked_bce_with_logits, mae_with_nan, bce_with_nan, focal_loss_with_logits):
    _fn.nan_maskable = True


# ---- GHM with explicit EMA bin state ---------------------------------------

def ghmc_loss(
    logits, target, last_bin_count: Optional[jnp.ndarray] = None,
    bins: int = 10, alpha: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient-harmonized BCE (reference GHMC_Loss, loss.py:98-133).
    Returns (loss, new_bin_count) — the EMA bin state is explicit."""
    x = logits.astype(jnp.float32)
    y = target.astype(jnp.float32)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(x)) - y)
    bin_idx = jnp.clip(jnp.floor(g * (bins - 0.0001)).astype(jnp.int32), 0, bins - 1)
    bin_count = jax.ops.segment_sum(
        jnp.ones_like(g).reshape(-1), bin_idx.reshape(-1), num_segments=bins
    )
    if last_bin_count is not None:
        bin_count = alpha * last_bin_count + (1 - alpha) * bin_count
    n = x.size
    nonempty = (bin_count > 0).sum().astype(jnp.float32)
    gd = jnp.maximum(bin_count * nonempty, 1e-4)
    beta = n / gd
    weight = beta[bin_idx]
    elem = _bce_elementwise(x, y) * weight
    return elem.mean(), bin_count


def ghmr_loss(
    logits, target, last_bin_count: Optional[jnp.ndarray] = None,
    bins: int = 10, alpha: float = 0.5, mu: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient-harmonized smooth-L1 regression (reference GHMR_Loss)."""
    x = logits.astype(jnp.float32)
    y = target.astype(jnp.float32)
    d = x - y
    g = jnp.abs(jax.lax.stop_gradient(d / jnp.sqrt(d * d + mu * mu)))
    bin_idx = jnp.clip(jnp.floor(g * (bins - 0.0001)).astype(jnp.int32), 0, bins - 1)
    bin_count = jax.ops.segment_sum(
        jnp.ones_like(g).reshape(-1), bin_idx.reshape(-1), num_segments=bins
    )
    if last_bin_count is not None:
        bin_count = alpha * last_bin_count + (1 - alpha) * bin_count
    n = x.size
    nonempty = (bin_count > 0).sum().astype(jnp.float32)
    gd = jnp.maximum(bin_count * nonempty, 1e-4)
    beta = n / gd
    loss = (jnp.sqrt(d * d + mu * mu) - mu) * beta[bin_idx]
    return loss.sum() / n, bin_count
