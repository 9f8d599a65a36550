"""Fused LayerNorm Pallas kernel (TPU) — forward AND recompute-stats backward.

Why this exists: the flagship train-step trace (docs/PERF.md "Remaining
profile") attributes ~1.2ms/step to latency-bound copy-done evictions of the
per-token LayerNorm statistics ([B,N] mean/rstd tensors, ~52us each) that XLA
saves between the forward and the backward across the ~23 LN sites of the
model (encoder 2/layer + embedding/final norms, ChemBERTa, cross-modal).
XLA-level fixes were measured and rejected (docs/PERF.md): remat of the LN
sites ballooned HLO bytes (+6.5GB), and a JAX-level custom-VJP that
recomputes the stats was defeated by CSE (the backward's recompute was merged
with the forward's compute, recreating the saved tensor).  A Pallas kernel is
opaque to CSE: the forward saves NOTHING but its own inputs (x, scale — both
needed downstream anyway), and the backward recomputes mean/rstd on-core from
the identical fp32 cast of x, so the stat tensors never exist in HBM.

CHIP VERDICT (flagship A/B, bench.py both ways in one session): NEUTRAL —
21.38ms/step kernel-off vs 21.50ms kernel-on, inside the ±0.5ms tunnel
spread.  The copy-done line in the trace overlapped with compute the kernel
could not reclaim; killing the stat tensors bought nothing at these shapes.
The kernel therefore defaults OFF and is kept as a tested, chip-validated
opt-in (MMDTI_PALLAS_LN=1) for shapes where LN is a larger fraction of the
step (e.g. much wider embeddings or shallow models).

Semantics match ``flax.linen.LayerNorm(dtype=float32)`` on an fp32 upcast of
x (the LayerNormFP32 contract used across the model, models/layers.py):
fast-variance stats (E[x^2] - E[x]^2, negative roundoff clipped to 0),
epsilon inside the rsqrt, scale+bias applied in fp32, result cast to the
requested output dtype.  The backward recompute is bit-identical to the
forward's stats because both start from the same fp32 cast of x.

Reference parity note: the reference applies torch.nn.LayerNorm under fp16
AMP (torch autocasts LN to fp32) — e.g. /root/reference/models/
transformers.py (self_attn_layer_norm / final_layer_norm) and
/root/reference/models/mm_module.py (post-LN BERT blocks).

Shape contract: x [..., E] with E % 128 == 0 (lane-aligned) and the flattened
token count T % 8 == 0 (sublane-aligned); anything else must take the XLA
path (``layer_norm_supported``).  Grid is 1-D over row blocks; dgamma/dbeta
accumulate in revisited fp32 [8, E] output blocks across sequential grid
steps (the gbf kernel's param-grad pattern, ops/pallas_gbf.py) — the row
blocks fold onto 8 sublanes via a major-dim reshape, so no cross-sublane
reduction is ever emitted.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-buffer VMEM cap for the row blocks: R*E fp32 elements.  ~6 fp32-sized
# buffers are live in the bwd (x, g_y, dx + temporaries); 262144 elems
# (1MB fp32) per buffer keeps the worst case ~6MB, comfortably inside the
# 16MB scoped-vmem budget even with double buffering.
_ROW_BLOCK_ELEM_CAP = 262144


def _row_block(T: int, E: int) -> int:
    """Largest multiple of 8 that divides T with R*E under the VMEM cap."""
    cap = max(8, _ROW_BLOCK_ELEM_CAP // max(E, 1))
    r = min(T, (cap // 8) * 8)
    while r >= 8:
        if T % r == 0:
            return r
        r -= 8
    return 0


def ln_kernel_enabled(use_pallas: bool, shape) -> bool:
    """Engage the fused LN kernel?  Chip-measured NEUTRAL on the flagship
    (module docstring), so the default is OFF; MMDTI_PALLAS_LN=1 opts in,
    read at trace time.  The model's use_pallas flag stays a hard gate even
    then — it carries the platform resolution (False on non-TPU backends,
    and on the XLA numerics-oracle configuration), where the kernel must
    never trace."""
    if os.environ.get("MMDTI_PALLAS_LN", "0") != "1":
        return False
    from mmdti_tpu.parallel.mesh import get_kernel_mesh

    if get_kernel_mesh() is not None:
        # opt-in kernel with no shard_map wrapper (chip-measured neutral, so
        # not worth mesh plumbing): under a multi-device mesh the mosaic
        # call would have no GSPMD rule — stay on the XLA LN
        return False
    return bool(use_pallas) and layer_norm_supported(shape)


def layer_norm_supported(shape) -> bool:
    """True when the fused kernel handles this activation shape."""
    if len(shape) < 2:
        return False
    E = shape[-1]
    T = 1
    for d in shape[:-1]:
        T *= d
    return E % 128 == 0 and T % 8 == 0 and _row_block(T, E) >= 8


def _stats(xf, eps):
    """flax _compute_stats semantics: fast variance, negatives clipped."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return mu, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)                  # [R, E]
    mu, rstd = _stats(xf, eps)
    mul = rstd * g_ref[0:1, :]
    y_ref[...] = ((xf - mu) * mul + b_ref[0:1, :]).astype(y_ref.dtype)


def _fold8(a):
    """[R, E] -> [8, E] partial sum via a major-dim reshape (R % 8 == 0)."""
    r, e = a.shape
    return jnp.sum(a.reshape(r // 8, 8, e), axis=0)


def _bwd_kernel(x_ref, g_ref, gy_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xf = x_ref[...].astype(jnp.float32)                  # [R, E]
    gy = gy_ref[...].astype(jnp.float32)                 # [R, E]
    mu, rstd = _stats(xf, eps)
    xhat = (xf - mu) * rstd

    wdy = gy * g_ref[0:1, :]
    c1 = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy, axis=-1, keepdims=True)
    dx_ref[...] = ((wdy - xhat * c1 - c2) * rstd).astype(dx_ref.dtype)

    dg_ref[...] += _fold8(gy * xhat)
    db_ref[...] += _fold8(gy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layer_norm(x2d, g2d, b2d, eps, out_dtype):
    y, _ = _layer_norm_fwd(x2d, g2d, b2d, eps, out_dtype)
    return y


def _layer_norm_fwd(x2d, g2d, b2d, eps, out_dtype):
    T, E = x2d.shape
    R = _row_block(T, E)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(T // R,),
        in_specs=[
            pl.BlockSpec((R, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, E), jnp.dtype(out_dtype)),
    )(x2d, g2d, b2d)
    return y, (x2d, g2d)


def _layer_norm_bwd(eps, out_dtype, res, gy):
    x2d, g2d = res
    T, E = x2d.shape
    R = _row_block(T, E)
    dx, dg8, db8 = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(T // R,),
        in_specs=[
            pl.BlockSpec((R, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, E), x2d.dtype),
            jax.ShapeDtypeStruct((8, E), jnp.float32),
            jax.ShapeDtypeStruct((8, E), jnp.float32),
        ],
    )(x2d, g2d, gy)
    return dx, dg8, db8


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm_fused(x, scale, bias, *, epsilon: float = 1e-5,
                     out_dtype=None):
    """Fused LayerNorm over the last axis; x [..., E], scale/bias [E].

    Stats and affine math run in fp32 (the LayerNormFP32 contract); the
    result is cast to ``out_dtype`` (default: x.dtype).  Caller must check
    ``layer_norm_supported``.
    """
    if not layer_norm_supported(x.shape):
        raise ValueError(
            f"fused layer norm unsupported at shape {x.shape}; "
            "check layer_norm_supported() and use the XLA path"
        )
    E = x.shape[-1]
    od = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    x2d = x.reshape(-1, E)
    # the [8, E] broadcast keeps the param blocks off the 1-sublane Mosaic
    # crash path; the broadcast's transpose sums the 8 rows, so the kernel's
    # 8-sublane folded partial sums need no special casing outside
    g2d = jnp.broadcast_to(scale.astype(jnp.float32)[None, :], (8, E))
    b2d = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (8, E))
    y = _layer_norm(x2d, g2d, b2d, float(epsilon), od.name)
    return y.reshape(x.shape)
