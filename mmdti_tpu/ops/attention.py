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


# ---------------------------------------------------------------------------
# Token-major dispatchers: one place owns the "fused Pallas when the flag is
# on AND the shape fits its VMEM envelope, else XLA with a head reshape"
# rule (it was previously copy-pasted into unimol.py / chemberta.py /
# crossmodal.py, risking drift of the support check or call signature).
# Inputs/outputs are token-major [B, L, E]; the [B,H,L,D] layout exists only
# inside the XLA fallback (or in VMEM inside the kernels).
# ---------------------------------------------------------------------------


def _split_heads(t, H):
    B, L, E = t.shape
    return t.reshape(B, L, H, E // H).transpose(0, 2, 1, 3)


def _merge_heads(t):
    B, H, L, D = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def masked_attention(q_tok, k_tok, v_tok, mask_bias, *, num_heads,
                     dropout_rate, dropout_rng, deterministic, use_pallas):
    """[B,Lq,E] x [B,Lk,E] masked attention (ChemBERTa / cross-modal)."""
    H = num_heads
    D = q_tok.shape[-1] // H
    if use_pallas and mask_bias is None:
        # the fused kernel requires a mask; the XLA path treats None as
        # "no mask" — keep that part of the contract available
        use_pallas = False
    if use_pallas and mask_bias.ndim == 4 and mask_bias.shape[1] not in (1,):
        # the fused kernel broadcasts ONE mask across heads (it reads
        # mask_bias[:, 0]); a per-head additive mask must take the XLA path
        # or heads 1..H-1 silently get head 0's mask
        use_pallas = False
    if use_pallas:
        from mmdti_tpu.ops.pallas_attention import masked_attention_supported

        use_pallas = masked_attention_supported(
            H, D, q_tok.shape[1], k_tok.shape[1], batch=q_tok.shape[0]
        )
    if use_pallas:
        from mmdti_tpu.ops.pallas_attention import masked_attention_pallas

        # fused kernel: softmax/dropout stay in VMEM and the backward
        # recomputes the logits — no [B,H,Lq,Lk] tensor in HBM
        return masked_attention_pallas(
            q_tok, k_tok, v_tok, mask_bias, num_heads=H,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
    ctx = cross_attention_xla(
        _split_heads(q_tok, H), _split_heads(k_tok, H), _split_heads(v_tok, H),
        mask_bias, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
    return _merge_heads(ctx)


def pair_bias_attention(q_tok, k_tok, v_tok, bias, *, num_heads,
                        dropout_rate, dropout_rng, deterministic,
                        pair_dtype, use_pallas):
    """[B,N,E] pair-bias attention returning (attn [B,N,E], new_bias)."""
    H = num_heads
    D = q_tok.shape[-1] // H
    N = q_tok.shape[1]
    if use_pallas:
        from mmdti_tpu.ops.pallas_attention import pallas_attention_supported

        # long sequences exceed the kernel's VMEM envelope -> XLA path
        # (remat already auto-enables there, train/nnmodel.py); under an
        # active kernel mesh the check also covers shard divisibility
        use_pallas = pallas_attention_supported(H, D, N, batch=q_tok.shape[0])
    if use_pallas:
        from mmdti_tpu.ops.pallas_attention import pair_bias_attention_pallas

        # token-major I/O: the kernel splits/merges heads in VMEM, so no
        # [B,H,N,D] relayout ever reaches HBM
        return pair_bias_attention_pallas(
            q_tok, k_tok, v_tok, bias.astype(pair_dtype), num_heads=H,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic, pair_dtype=pair_dtype,
        )
    attn, new_bias = pair_bias_attention_xla(
        _split_heads(q_tok, H), _split_heads(k_tok, H), _split_heads(v_tok, H),
        bias, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        deterministic=deterministic, pair_dtype=pair_dtype,
    )
    return _merge_heads(attn), new_bias
