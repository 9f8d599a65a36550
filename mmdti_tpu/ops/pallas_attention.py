"""Fused pair-bias attention Pallas kernels (TPU) — forward AND backward.

The load-bearing op of the Uni-Mol encoder (SURVEY §2.3): per (batch,
head-chunk) program, computes in VMEM

    logits = (q * D**-0.5) @ k^T + bias     (fp32; bias carries -inf pad fill)
    out    = dropout(softmax(logits)) @ v

and *returns the logits* as the next layer's bias (the pair-representation
threading of the reference, models/transformers.py:136-139).  Because the
logits are a layer output consumed downstream, the backward receives
cotangents for BOTH outputs; it runs as a second Pallas kernel that fuses the
whole gradient pipeline in VMEM:

    P  = softmax(logits)            (recomputed from the stored logits)
    dP = (g_out @ v^T) * drop_mask
    dL = P * (dP - rowsum(dP * P)) + g_logits
    dq = dL @ k * scale,  dk = dL^T @ q * scale,  dv = (drop*P)^T @ g_out,
    dbias = dL

Design notes (from 10-step xprof traces of the train step on the tunneled
v5e):

* XLA executes softmax (5.4ms/step), dropout uniforms + where (3.7ms/step)
  and the backward logits accumulation (3.1ms/step) as separate HBM-roundtrip
  fusions over the 15 threaded [B,H,N,N] tensors; the kernels keep every
  intermediate (probs, dropout mask, dP, dL) in VMEM.
* The threaded logits chain is stored in ``pair_dtype`` (bf16 halves its HBM
  traffic; softmax/accumulation stay fp32).
* Attention dropout uses the on-core PRNG seeded per program, replayed
  bit-identically in the backward — no mask tensor ever exists in HBM.
* I/O stays in the encoder's natural token-major layout: q/k/v arrive as
  [B, N, E] (= [B, N, H*D]) and the attention output is written back in the
  same layout, with the head split/merge done on VMEM-resident blocks.  The
  [B,H,N,D] materializations this replaces cost 5.7ms/step in relayout
  ("data formatting") time.

Numerics validated against the XLA oracle in tests/test_pallas.py (interpret
mode); see scripts/perf_probe.py for the honest timing methodology.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(seed_ref, shape, rate):
    """Dropout keep-mask from raw PRNG bits (uint32 threshold compare — no
    float conversion).  Seeded per (batch, head-chunk) program so the backward
    replays the identical stream.  (16-bit thresholds would halve the
    generation cost, but v5e Mosaic rejects sub-32-bit compares, both
    unsigned AND signed: "Target does not support this comparison".)"""
    flat_pid = (
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ) * pl.num_programs(2) + pl.program_id(2)
    pltpu.prng_seed(seed_ref[0] + flat_pid)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    cutoff = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return bits >= cutoff


def _softmax_parts(logits):
    """(p_un, inv_s): unnormalized softmax probs and the row normalizer,
    with the fully-masked-row guard.  Shared by the fwd and bwd cores so the
    guard/floor semantics can never diverge."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # guard fully-masked rows
    p = jnp.exp(logits - m)
    inv_s = 1.0 / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return p, inv_s


def _softmax_factored(seed_ref, logits, dropout_rate):
    """(p, inv_s): UNnormalized probs (dropout applied) and the row constant
    1/s (with the dropout keep-scale folded in).  The caller multiplies the
    PV matmul output by inv_s — one fewer full-pair VPU pass than dividing p.
    """
    p, inv_s = _softmax_parts(logits)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0)
        inv_s = inv_s * (1.0 / (1.0 - dropout_rate))
    return p, inv_s


def _attention_bwd_core(seed_ref, logits, dp_raw, dropout_rate):
    """Softmax+dropout backward in factored form: from the logits and
    dp_raw = g_out @ v^T, returns

      dl      [*,N,N]  logits cotangent (before any +g_logits term),
      pd_un   [*,N,N]  UNnormalized dropout-applied probs,
      g_scale [*,N,1]  row constant such that dv = pd_un^T @ (g_out*g_scale).

    Equivalent to the textbook probs/dropped/dmask formulation but never
    materializes probs or the dropout Jacobian as separate full-pair
    tensors; the fwd PRNG stream is replayed bit-identically via the shared
    (seed, program) seeding."""
    p_un, inv_s = _softmax_parts(logits)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, p_un.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        pd_un = jnp.where(keep, p_un, 0.0)
        dp_eff = jnp.where(keep, dp_raw * inv, 0.0)
        g_scale = inv_s * inv
    else:
        pd_un = p_un
        dp_eff = dp_raw
        g_scale = inv_s
    r = jnp.sum(dp_eff * p_un, axis=-1, keepdims=True) * inv_s
    dl = p_un * ((dp_eff - r) * inv_s)
    return dl, pd_un, g_scale


def _marshal_heads(block, buf, hc, D, once: bool = False):
    """[N, hc*D] lane groups -> buf [hc, N, D]; returns the gathered vector.

    Mosaic has no lane<->sublane reshape, so heads are marshalled through a
    small VMEM scratch with per-head lane-slice writes; the matmuls then run
    as ONE hc-batched dot_general (a per-head matmul loop measured 12ms/step
    slower — the tiny [N,D] dots serialize).  A one-hot selection-matmul
    marshal (MXU does the split/merge) was also measured and REJECTED: slower
    at N=64 (bwd 0.455 vs 0.358 ms/layer) and failing at N=256 — see
    docs/PERF.md "Tried and rejected".

    once=True: the source block is identical across the q-row-block grid dim
    (k/v under flash blocking) and the scratch persists, so only the first
    row block of a (batch, head-chunk) pair copies."""
    if once:
        @pl.when(pl.program_id(2) == 0)
        def _copy():
            for h in range(hc):
                buf[h] = block[:, h * D:(h + 1) * D].astype(jnp.float32)
    else:
        for h in range(hc):
            buf[h] = block[:, h * D:(h + 1) * D].astype(jnp.float32)
    return buf[:]


def _spread_heads(x, out_ref, hc, D, start=0):
    """[hc, N, D] -> per-head lane-group stores into out_ref[0] [N, hc*D]."""
    for h in range(hc):
        out_ref[0, :, start + h * D:start + (h + 1) * D] = x[h].astype(
            out_ref.dtype
        )


def _accum_heads(x, out_ref, hc, D):
    """Accumulating _spread_heads for outputs revisited across q-row blocks
    (dk/dv): the first row block of a (batch, head-chunk) pair assigns, the
    rest add.  The revolving output block stays VMEM-resident because its
    index_map ignores the row-block grid dim."""
    first = pl.program_id(2) == 0
    for h in range(hc):
        cur = jnp.where(
            first, 0.0, out_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
        )
        out_ref[0, :, h * D:(h + 1) * D] = (cur + x[h]).astype(out_ref.dtype)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, logits_ref,
                qb, kb, vb, *, hc: int, head_dim: int,
                dropout_rate: float):
    D = head_dim
    scale = D ** -0.5
    q = _marshal_heads(q_ref[0], qb, hc, D)
    k = _marshal_heads(k_ref[0], kb, hc, D, once=True)
    v = _marshal_heads(v_ref[0], vb, hc, D, once=True)

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0].astype(jnp.float32)
    logits_ref[0] = logits.astype(logits_ref.dtype)

    p, inv_s = _softmax_factored(seed_ref, logits, dropout_rate)

    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_s
    _spread_heads(out, out_ref, hc, D)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, logits_ref, gout_ref, glog_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, qb, kb, vb, gb,
                *, hc: int, head_dim: int, dropout_rate: float):
    D = head_dim
    scale = D ** -0.5
    logits = logits_ref[0].astype(jnp.float32)

    q = _marshal_heads(q_ref[0], qb, hc, D)
    k = _marshal_heads(k_ref[0], kb, hc, D, once=True)
    v = _marshal_heads(v_ref[0], vb, hc, D, once=True)
    g_out = _marshal_heads(gout_ref[0], gb, hc, D)

    # dP_raw = g_out @ v^T      [hc, N, N]
    dp_raw = jax.lax.dot_general(
        g_out, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dl, pd_un, g_scale = _attention_bwd_core(seed_ref, logits, dp_raw, dropout_rate)

    # dv = dropped^T @ g_out = pd_un^T @ (g_out * row-scale)   [hc, N, D]
    # (partial over this q-row block; accumulated across blocks)
    dv = jax.lax.dot_general(
        pd_un, g_out * g_scale,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    _accum_heads(dv, dv_ref, hc, D)

    dl = dl + glog_ref[0].astype(jnp.float32)
    dbias_ref[0] = dl.astype(dbias_ref.dtype)

    dq = jax.lax.dot_general(
        dl, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dl, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    _spread_heads(dq, dq_ref, hc, D)
    _accum_heads(dk, dk_ref, hc, D)


# Budget for VMEM-RESIDENT k/v-shaped scratches (elements of hc*n_cols*D).
# Counts per variant:
#   - pair-bias bwd: k + v fp32 marshal scratches + dk + dv fp32
#     accumulators = 4 resident fp32 arrays (16B/elem) + double-buffered
#     bf16 input blocks; 131,072 elems * ~20B = 2.6MB, leaving the pair
#     cap's 13MB+ intact.
#   - masked bwd: same 4 resident arrays (dk/dv output accumulators) —
#     the comment above _VMEM_ELEM_CAP intentionally excludes them here.
_KV_ELEM_CAP = 131_072


# Per-kernel-family pair-element caps for the q-row-blocking policy.  The
# binding constraint is always the BWD working set (fwd and bwd MUST share one
# policy: the dropout PRNG stream is seeded per grid program, so a different
# grid would break the bit-identical backward replay).
#
# MXU motivation for large row blocks (measured N=160 4.2x vs N=256 2.6x over
# XLA with the old shared 240k cap): an MXU pass processes up to 128 rows
# regardless of how many the block supplies, so qb=32 at N=256 wasted 4x of
# every QK/PV/dq pass and ran the dk/dv contractions at depth 32.  Raising
# the caps to reach qb=64..128 is close to free in VMEM terms because the
# per-element envelope estimates above were conservative:
#   pair bwd @ (hc=16, qb=64, N=256) = 262k elems x ~28B (4 fp32 temporaries
#     + 3 double-buffered bf16 streamed pair arrays) ~= 7.3MB, + k/v scratch
#     0.26MB + resident dk/dv 0.26MB  << 16MB VMEM
#   masked bwd: NO streamed pair arrays (logits recomputed) — but XLA's
#     latency-hiding scheduler may place the kernel's dq/dk/dv OUTPUT
#     arrays in scoped VMEM too (S(1)), so the kernel-internal envelope
#     must leave room.  Measured: at (hc=16, qb=256, Nk=64, D=32) — the
#     cross-modal shape under a 524k cap — B=64 runs fail Mosaic scoped
#     vmem by 148K-916K once ~8-17MB of outputs are vmem-placed; the
#     round-2-validated 240k cap (hc=8 there) leaves ~4MB headroom and
#     compiles at every measured shape.
_PAIR_ELEM_CAP = 262_144
# Deterministic (rate==0) forward-only calls have no dropout-replay coupling
# to the backward grid, so the fwd may use larger q-row blocks than the
# shared fwd/bwd policy: its live set has no dp_raw/dl/pd_un fp32 chain.
# 524k elems reaches qb=128 at N=256 (full MXU rows on the QK/PV passes).
# Chip-validated across the whole bucket ladder: N=192/qb=96, 224/112,
# 256/128, 280/56, 320/80 — the last is 491k elems with the 384-lane padded
# budget, so the cap's envelope boundary itself is compile-verified; the
# flagship N<=96 full-row branch is unaffected because full_row_cap still
# clamps to _PAIR_FULL_ROW_CAP.
_PAIR_FWD_DET_ELEM_CAP = 524_288
# Full-row (non-blocked) head-chunk selection budgets in PADDED elems: the
# pair blocks put N on the lane (minor) dim, which Mosaic pads to
# 128-multiples at EVERY N, so raw-N math underestimates small-N VMEM by up
# to 4x.  Chip facts all sit on one ~46B/padded-elem line for the pair bwd:
# (32,64) at N=64 fits (262144 padded), (64,48) at N=48 fails scoped vmem at
# 17.36M (393216 padded — the fit_probe small-molecule OOM this cap fixes),
# and the N=256 qb=128 bwd OOM at 23.8M is 524288 padded.  Cap at the
# validated 262144 point; the flagship (32,64) sits exactly on it.
_PAIR_FULL_ROW_CAP = 262_144
_MASKED_ELEM_CAP = 240_000
# Masked full-row selection sits on the same padded boundary as the pair
# family: (8, 256) at Nk=64 (262144 padded elems) compiles at B=64 while
# hc=16 (524288 padded) fails Mosaic scoped vmem by 148K-916K bytes — the
# full-row budget is padded elems, so the validated point needs its own cap
# (folding it into _MASKED_ELEM_CAP would also enlarge the blocked budget).
_MASKED_FULL_ROW_CAP = 262_144


def _lane_legal_chunks(H: int, D: int):
    """Head chunks obeying the Mosaic lane rule: the token-block minor dim
    hc*D must be 128-divisible (or the chunk must be the full E = H*D)."""
    return [
        hc for hc in range(1, H + 1)
        if H % hc == 0 and ((hc * D) % 128 == 0 or hc == H)
    ]


def _chunk_policy(H: int, n_rows: int, n_cols: int, D: int,
                  elem_cap: Optional[int] = None,
                  full_row_cap: Optional[int] = None):
    """(head_chunk, q_row_block) or None when the shapes are unsupported.

    Short sequences (flagship N<=96): the LARGEST lane-legal head chunk whose
    full-row working set fits the VMEM cap — one program per (batch,
    head-chunk), q-block = all rows.

    Long sequences (N=160/256, the reference max_atoms regime): flash-style
    q-row blocking — the smallest lane-legal head chunk, then the largest
    row block (multiple of 8 dividing n_rows) under the cap.  k/v (and their
    grad accumulators) stay VMEM-resident across the row blocks of a
    (batch, head-chunk) pair, so only q/out/pair blocks stream.
    """
    if elem_cap is None:  # resolved at call time so tests can monkeypatch
        elem_cap = _PAIR_ELEM_CAP
    if full_row_cap is None:
        full_row_cap = min(elem_cap, _PAIR_FULL_ROW_CAP)
    # n_cols sits on the lane (minor) dim of the (hc, qb, N) blocks, which
    # Mosaic pads to multiples of 128 — past 256 the raw-N cap math
    # overestimates headroom badly enough to pick compile-crashing configs
    # (measured at B=32, hc=16: 288/qb=48 and 280/qb=56 fail Mosaic scoped
    # vmem by 0.12M/1.32M while 280/qb=40, 288/qb=32 and 320/qb=40 compile
    # and run).  Budget with the padded width above 256; at or below 256 the
    # raw-N policies are chip-validated (N=160/qb=80, N=256/qb=64) and the
    # padded width would wrongly shrink them — keep them as measured.
    n_cols_eff = n_cols if n_cols <= 256 else -(-n_cols // 128) * 128
    # full-row selection always budgets the padded lane width (see the
    # _PAIR_FULL_ROW_CAP comment): at n_cols<128 the raw width understates
    # the block by up to 4x, which is how (64, 48) slipped under the old cap
    # and OOM'd Mosaic's scoped vmem on small-molecule datasets
    n_cols_fr = -(-n_cols // 128) * 128
    legal = _lane_legal_chunks(H, D)
    # the resident fp32 k/v scratches (2 x hc*n_cols*D, n_cols on SUBLANES
    # so no 128-padding) must also fit: cap them separately so huge-Nk cross
    # shapes fall back instead of blowing the Mosaic VMEM allocation at
    # compile time
    legal = [hc for hc in legal if hc * n_cols * D <= _KV_ELEM_CAP]
    best = None
    for hc in legal:
        if hc * n_rows * n_cols_fr <= full_row_cap:
            best = (hc, n_rows)
    if best is not None:
        return best
    for hc in legal:  # ascending: smallest chunk leaves the most row room
        max_qb = elem_cap // (hc * n_cols_eff)
        qb = 0
        for cand in range(8, n_rows, 8):
            if n_rows % cand == 0 and cand <= max_qb:
                qb = max(qb, cand)
        if qb:
            return (hc, qb)
    return None


# ---------------------------------------------------------------------------
# Mesh sharding.  pallas_call has no GSPMD partitioning rule, so inside a
# batch-sharded jit'd program the mosaic custom-call would force XLA to
# all-gather its operands (replicating the [B,H,N,N] pair chain across the
# mesh — exactly what DP exists to avoid).  When a mesh is registered
# (parallel.mesh.set_kernel_mesh, done by Trainer/MolServe/dryrun), the
# public wrappers below wrap the kernel in jax.shard_map: batch shards over
# 'data' and — when the head count divides legally — heads shard over
# 'model' (q/k/v are token-major with heads contiguous on E, so sharding E
# over 'model' IS head sharding; the pair bias shards its H dim).  Each
# shard runs the unmodified kernel on local shapes; gradients flow through
# shard_map's transpose (validated incl. replicated-operand psum on the
# 8-virtual-device CPU mesh, tests/test_pallas_mesh.py).
# ---------------------------------------------------------------------------


def _kernel_mesh_axes():
    """(mesh, data_par, model_par); (None, 1, 1) when no mesh is active."""
    from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, get_kernel_mesh

    mesh = get_kernel_mesh()
    if mesh is None:
        return None, 1, 1
    return mesh, mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]


def _mesh_local_counts(num_heads: int, batch: Optional[int]):
    """(H_local, B_local) under the active mesh, or None when the mesh cannot
    partition these shapes (indivisible batch/heads) — callers fall back to
    the XLA path, which GSPMD partitions natively."""
    mesh, dp, mp = _kernel_mesh_axes()
    if mesh is None:
        return num_heads, batch
    if batch is None and dp > 1:
        # a supported() gate called without batch= cannot prove the real
        # batch divides the data axis; report unsupported so legacy/external
        # callers take the documented XLA fallback instead of hitting the
        # wrapper's trace-time ValueError (ADVICE r4)
        return None
    if batch is not None and batch % dp != 0:
        return None
    if num_heads % mp != 0:
        return None
    return num_heads // mp, None if batch is None else batch // dp


# Odd 32-bit strides scattering per-shard dropout seeds: the per-program PRNG
# seeding (seed + flat_pid) restarts pid at 0 on every shard, so without an
# offset all data shards would replay IDENTICAL dropout masks.
_SEED_STRIDE_DATA = -1640531527   # 0x9E3779B9 as int32
_SEED_STRIDE_MODEL = 461845907    # 0x1B873593


def _shard_seed(seed, dp, mp):
    from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if dp > 1:
        off = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
        seed = seed + off * jnp.int32(_SEED_STRIDE_DATA)
    if mp > 1:
        off = jax.lax.axis_index(MODEL_AXIS).astype(jnp.int32)
        seed = seed + off * jnp.int32(_SEED_STRIDE_MODEL)
    return seed


def pallas_attention_supported(num_heads: int, head_dim: int, seq_len: int,
                               batch: Optional[int] = None) -> bool:
    """Whether the fused kernels handle these shapes (else use the XLA path).

    Mesh-aware: under an active kernel mesh the policy is evaluated at the
    per-shard shapes (batch/data, heads/model), and indivisible combinations
    report False so callers take the GSPMD-partitioned XLA path."""
    local = _mesh_local_counts(num_heads, batch)
    if local is None:
        return False
    h_local, _ = local
    return (
        seq_len % 8 == 0
        and _chunk_policy(h_local, seq_len, seq_len, head_dim) is not None
    )


def _q_spec(qb, hc, D):
    """[B, N, H*D] array consumed as (1, qb, hc*D) row-block chunks."""
    return pl.BlockSpec((1, qb, hc * D), lambda b, h, i, *_: (b, i, h),
                        memory_space=pltpu.VMEM)


def _kv_spec(N, hc, D):
    """[B, N, H*D] keys/values: full rows, resident across q-row blocks."""
    return pl.BlockSpec((1, N, hc * D), lambda b, h, i, *_: (b, 0, h),
                        memory_space=pltpu.VMEM)


def _mat_spec(hc, qb, N):
    return pl.BlockSpec((1, hc, qb, N), lambda b, h, i, *_: (b, h, i, 0),
                        memory_space=pltpu.VMEM)


def _seed_from_rng(dropout_rng) -> jnp.ndarray:
    if dropout_rng is None:
        return jnp.zeros((1,), jnp.int32)
    data = jax.random.key_data(dropout_rng).reshape(-1)
    return data[-1:].astype(jnp.int32)


# pair_dtype is carried as a string to stay hashable for nondiff_argnums.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6, 7, 8))
def _pallas_attention(q, k, v, bias, dropout_rate, seed, deterministic,
                      num_heads, pair_dtype):
    out, logits, _ = _run_fwd(
        q, k, v, bias, dropout_rate, seed, deterministic, num_heads, pair_dtype
    )
    return out, logits


def _run_fwd(q, k, v, bias, dropout_rate, seed, deterministic, H, pair_dtype):
    B, N, E = q.shape
    D = E // H
    rate = 0.0 if deterministic else dropout_rate
    # rate>0 REQUIRES the bwd to share this grid (per-program PRNG replay);
    # rate==0 has no such coupling, so the fwd alone may take bigger row
    # blocks (the bwd keeps its own policy from its own _chunk_policy call).
    policy = _chunk_policy(
        H, N, N, D,
        elem_cap=_PAIR_FWD_DET_ELEM_CAP if rate == 0.0 else None,
    )
    if policy is None:
        raise ValueError(
            f"pallas pair-bias attention unsupported at H={H}, N={N}, D={D}; "
            "check pallas_attention_supported() and use the XLA path"
        )
    hc, qb = policy
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc, N // qb),
        in_specs=[_q_spec(qb, hc, D), _kv_spec(N, hc, D), _kv_spec(N, hc, D),
                  _mat_spec(hc, qb, N)],
        out_specs=(_q_spec(qb, hc, D), _mat_spec(hc, qb, N)),
        scratch_shapes=[pltpu.VMEM((hc, qb, D), jnp.float32),
                        pltpu.VMEM((hc, N, D), jnp.float32),
                        pltpu.VMEM((hc, N, D), jnp.float32)],
    )
    out, logits = pl.pallas_call(
        functools.partial(_fwd_kernel, hc=hc, head_dim=D, dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, E), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, N), jnp.dtype(pair_dtype)),
        ),
    )(seed, q, k, v, bias)
    return out, logits, (q, k, v, logits, seed)


def _fwd_rule(q, k, v, bias, dropout_rate, seed, deterministic, H, pair_dtype):
    out, logits, res = _run_fwd(
        q, k, v, bias, dropout_rate, seed, deterministic, H, pair_dtype
    )
    return (out, logits), res


def _bwd_rule(dropout_rate, deterministic, H, pair_dtype, res, cotangents):
    q, k, v, logits, seed = res
    g_out, g_logits = cotangents
    B, N, E = q.shape
    D = E // H
    rate = 0.0 if deterministic else dropout_rate
    policy = _chunk_policy(H, N, N, D)
    if policy is None:
        raise ValueError(
            f"pallas pair-bias attention unsupported at H={H}, N={N}, D={D}; "
            "check pallas_attention_supported() and use the XLA path"
        )
    hc, qb = policy
    # multi-row-block dk/dv accumulate across the sequential grid: keep the
    # accumulator fp32 and cast once outside (a single block stays q.dtype)
    multi = qb < N
    dkv_dtype = jnp.float32 if multi else k.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc, N // qb),
        in_specs=[_q_spec(qb, hc, D), _kv_spec(N, hc, D), _kv_spec(N, hc, D),
                  _mat_spec(hc, qb, N), _q_spec(qb, hc, D),
                  _mat_spec(hc, qb, N)],
        out_specs=(
            _q_spec(qb, hc, D), _kv_spec(N, hc, D), _kv_spec(N, hc, D),
            _mat_spec(hc, qb, N),
        ),
        scratch_shapes=[pltpu.VMEM((hc, qb, D), jnp.float32),
                        pltpu.VMEM((hc, N, D), jnp.float32),
                        pltpu.VMEM((hc, N, D), jnp.float32),
                        pltpu.VMEM((hc, qb, D), jnp.float32)],
    )
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, hc=hc, head_dim=D, dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, E), q.dtype),
            jax.ShapeDtypeStruct((B, N, E), dkv_dtype),
            jax.ShapeDtypeStruct((B, N, E), dkv_dtype),
            jax.ShapeDtypeStruct((B, H, N, N), jnp.dtype(pair_dtype)),
        ),
    )(seed, q, k, v, logits, g_out.astype(q.dtype), g_logits)
    if multi:
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    # grads for (q, k, v, bias, seed); rate/det/H/pair_dtype are nondiff.
    # bias enters as pair_dtype (same as the stored logits), so dbias is too.
    return dq, dk, dv, dbias, None


_pallas_attention.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Masked (BERT-style) attention: ChemBERTa self-attention and the cross-modal
# fusion layers.  Unlike the pair-bias kernels there is no threaded logits
# output; the backward recomputes the logits from q/k (one extra MXU dot) so
# NOTHING is stored between fwd and bwd — the [B,H,Nq,Nk] probs/mask tensors
# that XLA materializes (softmax 0.08ms + dropout + backward fusions per
# layer) never exist in HBM.  The mask is an additive per-key row [B,1,Nk]
# (HF semantics: (1-mask)*large_negative), broadcast on-core.
# ---------------------------------------------------------------------------


def _masked_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                       qb, kb, vb, *, hc: int, head_dim: int,
                       dropout_rate: float):
    D = head_dim
    scale = D ** -0.5
    q = _marshal_heads(q_ref[0], qb, hc, D)
    k = _marshal_heads(k_ref[0], kb, hc, D, once=True)
    v = _marshal_heads(v_ref[0], vb, hc, D, once=True)

    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + mask_ref[0].astype(jnp.float32)[None]          # [hc, Nq, Nk]
    p, inv_s = _softmax_factored(seed_ref, logits, dropout_rate)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_s
    _spread_heads(out, out_ref, hc, D)


# The additive key mask is broadcast to [B, Nq, Nk] fp32 on the XLA side
# before entering the kernels (0.5MB at flagship shapes — vs the [B,H,Nq,Nk]
# probs tensors the kernel eliminates).  A [B,1,Nk] block crashes the Mosaic
# compiler (1-sublane vreg: "limits[i] <= dim(i) (8 vs. 1)").


def _masked_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, gout_ref,
                       dq_ref, dk_ref, dv_ref, qb, kb, vb, gb,
                       *, hc: int, head_dim: int, dropout_rate: float):
    D = head_dim
    scale = D ** -0.5
    q = _marshal_heads(q_ref[0], qb, hc, D)
    k = _marshal_heads(k_ref[0], kb, hc, D, once=True)
    v = _marshal_heads(v_ref[0], vb, hc, D, once=True)
    g_out = _marshal_heads(gout_ref[0], gb, hc, D)

    # recompute the forward (cheap MXU work instead of an HBM round-trip)
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + mask_ref[0].astype(jnp.float32)[None]

    dp_raw = jax.lax.dot_general(
        g_out, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dl, pd_un, g_scale = _attention_bwd_core(seed_ref, logits, dp_raw, dropout_rate)

    dv = jax.lax.dot_general(
        pd_un, g_out * g_scale,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    _accum_heads(dv, dv_ref, hc, D)

    dq = jax.lax.dot_general(
        dl, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dl, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    _spread_heads(dq, dq_ref, hc, D)
    _accum_heads(dk, dk_ref, hc, D)


def masked_attention_supported(num_heads: int, head_dim: int, q_len: int,
                               k_len: int, batch: Optional[int] = None) -> bool:
    """Whether the masked-attention kernels handle these shapes (mesh-aware,
    see pallas_attention_supported)."""
    local = _mesh_local_counts(num_heads, batch)
    if local is None:
        return False
    h_local, _ = local
    return (
        q_len % 8 == 0
        and k_len % 8 == 0
        and _chunk_policy(h_local, q_len, k_len, head_dim,
                          elem_cap=_MASKED_ELEM_CAP,
                          full_row_cap=_MASKED_FULL_ROW_CAP) is not None
    )


def _masked_specs(Nq, Nk, hc, qb, D):
    q_spec = _q_spec(qb, hc, D)
    kv_spec = _kv_spec(Nk, hc, D)
    mask_spec = pl.BlockSpec((1, qb, Nk), lambda b, h, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM)
    return q_spec, kv_spec, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6, 7))
def _masked_attention(q, k, v, mask, dropout_rate, seed, deterministic,
                      num_heads):
    out, _ = _masked_fwd_rule(
        q, k, v, mask, dropout_rate, seed, deterministic, num_heads
    )
    return out


def _masked_fwd_rule(q, k, v, mask, dropout_rate, seed, deterministic, H):
    B, Nq, E = q.shape
    Nk = k.shape[1]
    D = E // H
    rate = 0.0 if deterministic else dropout_rate
    policy = _chunk_policy(H, Nq, Nk, D, elem_cap=_MASKED_ELEM_CAP,
                           full_row_cap=_MASKED_FULL_ROW_CAP)
    if policy is None:
        raise ValueError(
            f"pallas masked attention unsupported at H={H}, Nq={Nq}, Nk={Nk}; "
            "check masked_attention_supported() and use the XLA path"
        )
    hc, qb = policy
    q_spec, kv_spec, mask_spec = _masked_specs(Nq, Nk, hc, qb, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc, Nq // qb),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=q_spec,
        scratch_shapes=[pltpu.VMEM((hc, qb, D), jnp.float32),
                        pltpu.VMEM((hc, Nk, D), jnp.float32),
                        pltpu.VMEM((hc, Nk, D), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_masked_fwd_kernel, hc=hc, head_dim=D,
                          dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, E), q.dtype),
    )(seed, q, k, v, mask)
    return out, (q, k, v, mask, seed)


def _masked_bwd_rule(dropout_rate, deterministic, H, res, g_out):
    q, k, v, mask, seed = res
    B, Nq, E = q.shape
    Nk = k.shape[1]
    D = E // H
    rate = 0.0 if deterministic else dropout_rate
    hc, qb = _chunk_policy(H, Nq, Nk, D, elem_cap=_MASKED_ELEM_CAP,
                           full_row_cap=_MASKED_FULL_ROW_CAP)
    multi = qb < Nq
    dkv_dtype = jnp.float32 if multi else k.dtype
    q_spec, kv_spec, mask_spec = _masked_specs(Nq, Nk, hc, qb, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hc, Nq // qb),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        scratch_shapes=[pltpu.VMEM((hc, qb, D), jnp.float32),
                        pltpu.VMEM((hc, Nk, D), jnp.float32),
                        pltpu.VMEM((hc, Nk, D), jnp.float32),
                        pltpu.VMEM((hc, qb, D), jnp.float32)],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_masked_bwd_kernel, hc=hc, head_dim=D,
                          dropout_rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Nq, E), q.dtype),
            jax.ShapeDtypeStruct((B, Nk, E), dkv_dtype),
            jax.ShapeDtypeStruct((B, Nk, E), dkv_dtype),
        ),
    )(seed, q, k, v, mask, g_out.astype(q.dtype))
    if multi:
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    # the additive mask derives from integer attention masks — zero cotangent
    return dq, dk, dv, jnp.zeros_like(mask), None


_masked_attention.defvjp(_masked_fwd_rule, _masked_bwd_rule)


def masked_attention_pallas(
    q: jnp.ndarray,      # [B, Nq, E] token-major (E = H*D, heads contiguous)
    k: jnp.ndarray,      # [B, Nk, E]
    v: jnp.ndarray,      # [B, Nk, E]
    mask_bias: jnp.ndarray,  # additive key mask [B, 1, Nk] (or [B,1,1,Nk])
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Fused masked attention (BERT semantics); returns out [B, Nq, E]."""
    if mask_bias.ndim == 4:
        mask_bias = mask_bias[:, 0]
    mask_bias = jnp.broadcast_to(
        mask_bias.astype(jnp.float32), (q.shape[0], q.shape[1], k.shape[1])
    )
    seed = _seed_from_rng(dropout_rng)
    det = deterministic or dropout_rate == 0.0 or dropout_rng is None
    mesh, dp, mp = _kernel_mesh_axes()
    if mesh is not None:
        if q.shape[0] % dp or num_heads % mp:
            raise ValueError(
                f"masked attention cannot shard B={q.shape[0]}, H={num_heads} "
                f"over a ({dp},{mp}) mesh; gate with "
                "masked_attention_supported(..., batch=B)"
            )
        from jax.sharding import PartitionSpec as P

        from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        h_local = int(num_heads) // mp
        m_ax = MODEL_AXIS if mp > 1 else None
        tok = P(DATA_AXIS, None, m_ax)

        def _body(seed, q, k, v, mask):
            return _masked_attention(
                q, k, v, mask, float(dropout_rate), _shard_seed(seed, dp, mp),
                bool(det), h_local,
            )

        return jax.shard_map(
            _body, mesh=mesh,
            in_specs=(P(), tok, tok, tok, P(DATA_AXIS, None, None)),
            out_specs=tok, check_vma=False,
        )(seed, q, k, v, mask_bias)
    return _masked_attention(
        q, k, v, mask_bias, float(dropout_rate), seed, bool(det),
        int(num_heads),
    )


def pair_bias_attention_pallas(
    q: jnp.ndarray,      # [B, N, E] token-major (E = H*D, heads contiguous)
    k: jnp.ndarray,      # [B, N, E]
    v: jnp.ndarray,      # [B, N, E]
    bias: jnp.ndarray,   # [B, H, N, N] additive bias (with -inf pad fill)
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    pair_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused pair-bias attention; returns (out [B,N,E], logits [B,H,N,N])."""
    seed = _seed_from_rng(dropout_rng)
    det = deterministic or dropout_rate == 0.0 or dropout_rng is None
    pd_name = jnp.dtype(pair_dtype).name
    mesh, dp, mp = _kernel_mesh_axes()
    if mesh is not None:
        if q.shape[0] % dp or num_heads % mp:
            raise ValueError(
                f"pair-bias attention cannot shard B={q.shape[0]}, "
                f"H={num_heads} over a ({dp},{mp}) mesh; gate with "
                "pallas_attention_supported(..., batch=B)"
            )
        from jax.sharding import PartitionSpec as P

        from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        h_local = int(num_heads) // mp
        m_ax = MODEL_AXIS if mp > 1 else None
        tok = P(DATA_AXIS, None, m_ax)
        pair = P(DATA_AXIS, m_ax, None, None)

        def _body(seed, q, k, v, bias):
            return _pallas_attention(
                q, k, v, bias, float(dropout_rate), _shard_seed(seed, dp, mp),
                bool(det), h_local, pd_name,
            )

        return jax.shard_map(
            _body, mesh=mesh,
            in_specs=(P(), tok, tok, tok, pair),
            out_specs=(tok, pair), check_vma=False,
        )(seed, q, k, v, bias)
    return _pallas_attention(
        q, k, v, bias, float(dropout_rate), seed, bool(det),
        int(num_heads), pd_name,
    )
