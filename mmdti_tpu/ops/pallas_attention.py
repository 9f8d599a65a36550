"""Fused pair-bias attention Pallas kernel (TPU).

The load-bearing op of the Uni-Mol encoder (SURVEY §2.3): per batch-element
program, computes for all heads at once

    logits = (q * D**-0.5) @ k^T + bias     (fp32, bias carries -inf pad fill)
    out    = dropout(softmax(logits)) @ v

entirely in VMEM — one kernel instead of XLA's qk-matmul / add / softmax /
pv-matmul chain — and *returns the logits* as the next layer's bias (the
pair-representation threading of models/transformers.py:136-139 in the
reference).  Because the logits are a layer output consumed downstream, the
backward pass receives cotangents for BOTH outputs; the custom VJP fuses the
softmax backward with the direct logits gradient:

    dL = P * (dP - rowsum(dP * P)) + g_logits,   dP = (g_out @ v^T) * drop
    dq = dL @ k * scale,  dk = dL^T @ q * scale,  dv = (drop*P)^T @ g_out,
    dbias = dL

Layout: (batch, head-chunk) grid with [hc,N,*] blocks per program, hc sized to
the 16MB VMEM budget; heads are batched in-kernel.  The backward runs as XLA
einsums with the dropout mask replayed by a small kernel.

Honest (queue-saturated, difference-based) timing at the flagship shapes
(B=32,H=64,N=64,D=8) on v5e puts the full-model forward at 10.3ms via this
kernel vs 9.2ms via the XLA chain — head_dim 8 underfeeds the MXU either way
and XLA's fusion of the [B,H,N,N] fp32 chain is already tight, so XLA is the
default path for both training and inference.  The kernel remains available
(use_pallas=True), numerics-validated against the oracle
(tests/test_pallas.py), and is the substrate for future fusions (e.g.
computing the Gaussian edge bias inline).  Attention dropout uses the on-core
PRNG seeded per program, identical across fwd/bwd replay.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_mask(seed_ref, shape, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    bits = pltpu.prng_random_bits(shape)
    uniform = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return uniform >= rate


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, logits_ref,
                *, dropout_rate: float):
    q = q_ref[0].astype(jnp.float32)          # [H, N, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0]                        # [H, N, N] fp32
    scale = q.shape[-1] ** -0.5

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias
    logits_ref[0] = logits

    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # guard fully-masked rows
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / jnp.maximum(s, 1e-30)

    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref, probs.shape, dropout_rate)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _head_chunk(H: int, N: int, n_mats: int) -> int:
    """Largest divisor of H whose [hc,N,N] fp32 working set (n_mats matrices,
    double-buffered) stays within ~half of the 16MB VMEM."""
    budget = 6 * 1024 * 1024
    hc = max(1, budget // max(1, N * N * 4 * n_mats))
    hc = min(H, hc)
    while H % hc != 0:
        hc -= 1
    return hc


def _specs(B, H, hc, N, D):
    # index maps get the scalar-prefetch ref appended after grid indices
    qkv = pl.BlockSpec((1, hc, N, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, hc, N, N), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM)
    return qkv, mat


def _seed_from_rng(dropout_rng) -> jnp.ndarray:
    if dropout_rng is None:
        return jnp.zeros((1,), jnp.int32)
    data = jax.random.key_data(dropout_rng).reshape(-1)
    return data[-1:].astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def _pallas_attention(q, k, v, bias, dropout_rate, seed, deterministic):
    out, logits, _ = _pallas_attention_fwd(q, k, v, bias, dropout_rate, seed, deterministic)
    return out, logits


def _pallas_attention_fwd(q, k, v, bias, dropout_rate, seed, deterministic):
    B, H, N, D = q.shape
    rate = 0.0 if deterministic else dropout_rate
    # n_mats=8 (the bwd working set) so fwd and bwd share one chunking and the
    # per-program dropout streams line up between passes
    hc = _head_chunk(H, N, n_mats=8)
    qkv_spec, mat_spec = _specs(B, H, hc, N, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mat_spec],
        out_specs=(qkv_spec, mat_spec),
    )
    out, logits = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
        ),
    )(seed, q, k, v, bias.astype(jnp.float32))
    return out, logits, (q, k, v, logits, seed)


def _pallas_attention_fwd_rule(q, k, v, bias, dropout_rate, seed, deterministic):
    out, logits, res = _pallas_attention_fwd(q, k, v, bias, dropout_rate, seed, deterministic)
    return (out, logits), res


def _mask_kernel(seed_ref, out_ref, *, dropout_rate: float):
    keep = _dropout_mask(seed_ref, out_ref.shape[1:], dropout_rate)
    out_ref[0] = keep.astype(jnp.int8)


def _regen_dropout_mask(seed, B, H, N, rate):
    """Replay the forward kernel's PRNG stream (same chunking => same seeds)."""
    hc = _head_chunk(H, N, n_mats=8)
    mat_spec = pl.BlockSpec(
        (1, hc, N, N), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc),
        in_specs=[],
        out_specs=mat_spec,
    )
    return pl.pallas_call(
        functools.partial(_mask_kernel, dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, N), jnp.int8),
    )(seed)


def _pallas_attention_bwd(dropout_rate, deterministic, res, cotangents):
    """Backward in XLA batched einsums (fuses better than a Pallas bwd at
    these shapes); the fwd dropout mask is replayed with a tiny kernel."""
    q, k, v, logits, seed = res
    g_out, g_logits = cotangents
    B, H, N, D = q.shape
    rate = 0.0 if deterministic else dropout_rate
    scale = D ** -0.5

    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    probs = p / jnp.maximum(p.sum(-1, keepdims=True), 1e-30)

    if rate > 0.0:
        keep = _regen_dropout_mask(seed, B, H, N, rate).astype(jnp.float32)
        inv = 1.0 / (1.0 - rate)
        dropped = probs * keep * inv
        dmask = keep * inv
    else:
        dropped = probs
        dmask = None

    g32 = g_out.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", dropped, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum(
        "bhnd,bhmd->bhnm", g32, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    if dmask is not None:
        dp = dp * dmask
    dl = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dl = dl + g_logits.astype(jnp.float32)

    dq = jnp.einsum("bhnm,bhmd->bhnd", dl, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", dl, q.astype(jnp.float32)) * scale
    # grads for (q, k, v, bias, seed); rate/deterministic are nondiff
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dl, None


_pallas_attention.defvjp(_pallas_attention_fwd_rule, _pallas_attention_bwd)


def pair_bias_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.attention.pair_bias_attention_xla."""
    seed = _seed_from_rng(dropout_rng)
    det = deterministic or dropout_rate == 0.0 or dropout_rng is None
    return _pallas_attention(q, k, v, bias, float(dropout_rate), seed, bool(det))
