"""Pair-bias self-attention — the load-bearing op of the Uni-Mol encoder.

Semantics (matching unicore's SelfMultiheadAttention as used by the reference
at /root/reference/models/transformers.py:136-139): each layer receives an
additive per-head bias [B,H,N,N] (which already carries -inf at padded key
positions), computes

    logits = (q * head_dim**-0.5) @ k^T + bias
    out    = dropout(softmax(logits)) @ v

and *returns the logits as the next layer's bias* — the pair representation is
threaded through the stack via the attention logits.

Two implementations behind one call:
  * XLA path (this file): einsum + fp32 softmax, fully fused by XLA; serves as
    the numerics oracle.
  * Pallas path (mmdti_tpu.ops.pallas_attention): fused kernel that keeps the
    [N,N] tiles in VMEM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pair_bias_attention_xla(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,  # [B, H, N, D]
    v: jnp.ndarray,  # [B, H, N, D]
    bias: jnp.ndarray,  # [B, H, N, N] additive bias (with -inf pad fill)
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    pair_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (attention_output [B,H,N,D], new_bias [B,H,N,N]).

    Accumulation and softmax run in fp32; the returned logits are *stored* in
    pair_dtype.  bf16 storage halves the HBM traffic of the layer-threaded
    [B,H,N,N] tensors (the model's memory hot spot, SURVEY §5) and mirrors the
    reference's fp16-AMP precision for this chain (tasks/trainer.py:181-182).
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs.astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype), logits.astype(pair_dtype)


def merge_padding_into_bias(
    bias: jnp.ndarray,  # [B, H, N, N]
    padding_mask: Optional[jnp.ndarray],  # [B, N] True where padded
    fill_value: float = float("-inf"),
    pair_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Fill padded *key* positions with -inf once before the stack
    (reference: fill_attn_mask, models/transformers.py:122-132)."""
    bias = bias.astype(pair_dtype)
    if padding_mask is None:
        return bias
    return jnp.where(padding_mask[:, None, None, :], jnp.asarray(fill_value, pair_dtype), bias)


def cross_attention_xla(
    q: jnp.ndarray,  # [B, H, Nq, D]
    k: jnp.ndarray,  # [B, H, Nk, D]
    v: jnp.ndarray,  # [B, H, Nk, D]
    mask_bias: Optional[jnp.ndarray],  # additive [B, 1|H, 1|Nq, Nk]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Plain additive-mask cross attention (BERT-style, -10000 masks)."""
    head_dim = q.shape[-1]
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / (head_dim ** 0.5)
    if mask_bias is not None:
        logits = logits + mask_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
