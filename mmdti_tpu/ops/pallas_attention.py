"""Fused pair-bias attention Pallas kernel (TPU).

The load-bearing op of the Uni-Mol encoder (SURVEY §2.3): per (batch, head)
program, computes

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

Shapes: q,k,v [B,H,N,D], bias [B,H,N,N].  N <= 258, D = 8 for the flagship
config, so full [N,N] tiles fit comfortably in VMEM.  Attention dropout uses
the on-core PRNG seeded per (batch, head) program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, logits_ref,
                *, dropout_rate: float):
    q = q_ref[0, 0].astype(jnp.float32)          # [N, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0]                        # [N, N] fp32
    scale = q.shape[-1] ** -0.5

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    logits_ref[0, 0] = logits

    m = jnp.max(logits, axis=-1, keepdims=True)
    # fully-masked rows (all -inf) would give nan; guard the max
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / jnp.maximum(s, 1e-30)

    if dropout_rate > 0.0:
        b = pl.program_id(0)
        h = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + h)
        bits = pltpu.prng_random_bits(probs.shape)
        keep = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) >= dropout_rate
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, logits_ref, gout_ref, glog_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, dropout_rate: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    logits = logits_ref[0, 0]
    g_out = gout_ref[0, 0].astype(jnp.float32)
    g_log = glog_ref[0, 0]
    scale = q.shape[-1] ** -0.5

    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / jnp.maximum(s, 1e-30)

    if dropout_rate > 0.0:
        b = pl.program_id(0)
        h = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + h)
        bits = pltpu.prng_random_bits(probs.shape)
        keep = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) >= dropout_rate
        dropped = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        dmask = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
    else:
        dropped = probs
        dmask = None

    # dv = dropped^T @ g_out
    dv = jax.lax.dot_general(
        dropped, g_out,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dP (through dropout) then softmax backward
    dp = jax.lax.dot_general(
        g_out, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dmask is not None:
        dp = dp * dmask
    dl = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dl = dl + g_log

    dbias_ref[0, 0] = dl
    dq = jax.lax.dot_general(
        dl, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        dl, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)


def _specs(B, H, N, D):
    # index maps get the scalar-prefetch ref appended after grid indices
    qkv = pl.BlockSpec((1, 1, N, D), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, 1, N, N), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM)
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
    qkv_spec, mat_spec = _specs(B, H, N, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
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


def _pallas_attention_bwd(dropout_rate, deterministic, res, cotangents):
    q, k, v, logits, seed = res
    g_out, g_logits = cotangents
    B, H, N, D = q.shape
    rate = 0.0 if deterministic else dropout_rate
    qkv_spec, mat_spec = _specs(B, H, N, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mat_spec, qkv_spec, mat_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, mat_spec),
    )
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
            jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
        ),
    )(seed, q, k, v, logits, g_out.astype(q.dtype), g_logits.astype(jnp.float32))
    # grads for (q, k, v, bias, seed); rate/deterministic are nondiff
    return dq, dk, dv, dbias, None


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
