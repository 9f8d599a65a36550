"""ConR / SupCon style contrastive losses (pure jnp).

Math twins of /root/reference/models/contrastive.py:
  * ct_regress  — label-distance positives (|dy| <= w), mispredicted-but-close
    negatives, push weights l_dist * sample_weight * e, per-anchor normalized
    log-ratio, anchors with no negatives zeroed.
  * ct_single   — exact-label-match positives, external sample weights as push
    weights.
  * ct_multi    — label-agreement-fraction matrix thresholded at
    coef/num_classes.

Quirk preserved deliberately: masked similarity entries enter the softmax
denominator as exp(0)=1 (the reference multiplies the similarity matrix by the
positive mask *before* exponentiation, contrastive.py:45,53).  All math in
fp32.  Like InfoNCE, under pjit these operate on the global batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _normalize_rows(x):
    return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


def _pair_loss(prod, pos_i, neg_i, pushing_w, denom):
    """Shared tail: per-anchor normalized log-ratio with no-negative zeroing."""
    pos = prod * pos_i
    neg = prod * neg_i
    neg_exp_dot = (pushing_w * jnp.exp(neg) * neg_i).sum(axis=1)
    no_neg_flag = (neg_i.sum(axis=1) > 0).astype(prod.dtype)
    z = jnp.exp(pos).sum(axis=1) + neg_exp_dot
    per_pair = -(pos - jnp.log(z)[:, None])  # == -log(exp(pos)/z)
    loss = (per_pair * pos_i).sum(axis=1) / denom
    return (loss * no_neg_flag).mean()


def ct_regress(
    feature: jnp.ndarray,         # [B, F]
    target: jnp.ndarray,          # [B, C] (scaled labels)
    output: jnp.ndarray,          # [B, K] model logits/predictions
    weights: Optional[jnp.ndarray] = None,  # [B] or [B, C] sample weights
    w: float = 0.2,
    t: float = 0.07,
    e: float = 0.01,
) -> jnp.ndarray:
    f = feature.reshape(feature.shape[0], -1).astype(jnp.float32)
    B = f.shape[0]
    # nanmean over label columns so NaN-masked multilabel-regression targets
    # (supported by mae_with_nan) contribute their valid columns; rows with
    # no valid label at all yield NaN and are excluded from every pair below.
    labels = jnp.nanmean(target.reshape(B, -1).astype(jnp.float32), axis=1, keepdims=True)
    preds = output.reshape(B, -1).astype(jnp.float32).mean(axis=1, keepdims=True)
    l_dist = jnp.abs(labels - labels.T)
    p_dist = jnp.abs(preds - preds.T)
    valid = ~jnp.isnan(l_dist)  # pairs where both anchors have a valid label
    l_dist = jnp.where(valid, l_dist, jnp.inf)

    qn = _normalize_rows(f)
    eye = jnp.eye(B, dtype=bool)
    pos_i = ((l_dist <= w) & ~eye).astype(jnp.float32)
    neg_i = (valid & (~(l_dist <= w)) & (p_dist <= w)).astype(jnp.float32)
    prod = (qn @ qn.T) / t

    if weights is None:
        wvec = jnp.ones((B, 1), dtype=jnp.float32)
    else:
        wvec = weights.reshape(B, -1).astype(jnp.float32).mean(axis=1, keepdims=True)
    # inf distances only ever multiply a zero neg mask — scrub them so the
    # exp-weighted sum stays finite
    pushing_w = jnp.where(valid, l_dist, 0.0) * wvec * e
    denom = (l_dist <= w).sum(axis=1).astype(jnp.float32)  # includes diagonal
    denom = jnp.maximum(denom, 1.0)  # all-NaN anchors: avoid 0/0 (loss is 0)
    return _pair_loss(prod, pos_i, neg_i, pushing_w, denom)


def ct_single(
    feature: jnp.ndarray,
    target: jnp.ndarray,
    output: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    w: float = 0.2,
    t: float = 0.07,
    e: float = 0.2,
) -> jnp.ndarray:
    del output, w, e
    f = feature.reshape(feature.shape[0], -1).astype(jnp.float32)
    B = f.shape[0]
    labels = target.reshape(B, -1).astype(jnp.float32)
    l_dist = jnp.abs(labels[:, :1] - labels[:, :1].T)

    qn = _normalize_rows(f)
    eye = jnp.eye(B, dtype=bool)
    pos_i = ((l_dist == 0) & ~eye).astype(jnp.float32)
    neg_i = (l_dist != 0).astype(jnp.float32)
    prod = (qn @ qn.T) / t

    if weights is None:
        pushing_w = jnp.ones((1, B), dtype=jnp.float32)
    else:
        # reference broadcasts a [B] weight vector against the [B,B] similarity
        # matrix, i.e. per-*key* scaling (contrastive.py:94-97)
        pushing_w = weights.reshape(B, -1).astype(jnp.float32).mean(axis=1)[None, :]
    denom = pos_i.sum(axis=1)
    denom = jnp.where(denom == 0, 1.0, denom)
    return _pair_loss(prod, pos_i, neg_i, pushing_w, denom)


def ct_multi(
    feature: jnp.ndarray,
    target: jnp.ndarray,
    output: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    w: float = 0.2,
    t: float = 0.07,
    e: float = 0.2,
    coef: float = 1.0,
) -> jnp.ndarray:
    del output, w, e
    f = feature.reshape(feature.shape[0], -1).astype(jnp.float32)
    B = f.shape[0]
    labels = target.reshape(B, -1)
    num_classes = labels.shape[1]
    agree = (labels[:, None, :] == labels[None, :, :]).mean(axis=-1).astype(jnp.float32)

    qn = _normalize_rows(f)
    eye = jnp.eye(B, dtype=bool)
    threshold = coef / num_classes
    pos_i = ((agree >= threshold) & ~eye).astype(jnp.float32)
    neg_i = (agree < threshold).astype(jnp.float32)
    prod = (qn @ qn.T) / t

    if weights is None:
        pushing_w = jnp.ones((1, B), dtype=jnp.float32)
    else:
        # per-key scaling, as in ct_single (reference contrastive.py:149-153)
        pushing_w = weights.reshape(B, -1).astype(jnp.float32).mean(axis=1)[None, :]
    denom = pos_i.sum(axis=1)
    denom = jnp.where(denom == 0, 1.0, denom)
    return _pair_loss(prod, pos_i, neg_i, pushing_w, denom)


CT_REGISTRY = {
    "regression": ct_regress,
    "classification": ct_single,
    "multiclass": ct_single,
    "multilabel_classification": ct_multi,
    "multilabel_regression": ct_regress,
}
