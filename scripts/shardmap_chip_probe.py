"""Compiled Mosaic kernels under jax.shard_map on the REAL chip.

All round-4 shard_map x Pallas evidence was interpret-mode on the CPU mesh:
on the real chip a size-1 mesh deliberately registers as None
(parallel/mesh.py), so the compiled-kernel-under-shard_map lowering that
multi-chip runs would use had never executed on TPU (VERDICT r4 #3).  This
probe registers a FORCED 1-device ('data','model') mesh
(set_kernel_mesh(mesh, force=True)) and runs all three kernel families
compiled — not interpret — inside jax.shard_map, asserting value + grad
parity against the unmeshed compiled kernels.  Cross-chip collectives remain
physically untestable on one chip (accepted); this closes the lowering half
of the composition risk.

Usage: python scripts/shardmap_chip_probe.py   (run on the TPU; ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmdti_tpu.ops import pallas_attention as pa
from mmdti_tpu.ops import pallas_gbf as pg
from mmdti_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, set_kernel_mesh

B, H, D, N, L, K = 8, 64, 8, 64, 64, 128
E = H * D


def _diff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def run_family(name, fn, args, rate):
    """fn(*args) -> scalar-reducible outputs; compare unmeshed vs forced mesh."""
    loss = jax.jit(lambda *a: fn(*a)[0])
    grad = jax.jit(jax.grad(lambda *a: fn(*a)[0], argnums=tuple(range(len(args)))))

    set_kernel_mesh(None)
    v0, g0 = loss(*args), grad(*args)
    jax.block_until_ready((v0, g0))

    mesh = jax.make_mesh((1, 1), (DATA_AXIS, MODEL_AXIS))
    set_kernel_mesh(mesh, force=True)
    # fresh jits: the mesh is read at trace time
    loss_m = jax.jit(lambda *a: fn(*a)[0])
    grad_m = jax.jit(jax.grad(lambda *a: fn(*a)[0], argnums=tuple(range(len(args)))))
    v1, g1 = loss_m(*args), grad_m(*args)
    jax.block_until_ready((v1, g1))
    set_kernel_mesh(None)

    dv = _diff(jnp.asarray(v0), jnp.asarray(v1))
    dg = max(_diff(a, b) for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    status = "OK" if (dv == 0.0 and dg == 0.0) else f"DIFF value={dv:g} grad={dg:g}"
    print(f"{name:26s} rate={rate}: value_diff={dv:g} max_grad_diff={dg:g}  {status}")
    assert dv == 0.0 and dg == 0.0, f"{name} rate={rate}: shard_map path diverged"


def main():
    assert jax.default_backend() == "tpu", "run this on the real chip"
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, E), jnp.float32).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.randn(B, H, N, N) * 0.1, jnp.float32).astype(jnp.bfloat16)
    key = jax.random.PRNGKey(7)

    for rate in (0.0, 0.1):
        def pair(q, bias, _r=rate):
            o, lgt = pa.pair_bias_attention_pallas(
                q, q, q, bias, num_heads=H, dropout_rate=_r, dropout_rng=key,
                deterministic=(_r == 0.0), pair_dtype=jnp.bfloat16)
            return ((o.astype(jnp.float32) ** 2).mean()
                    + (lgt.astype(jnp.float32) ** 2).mean(),)
        run_family("pair_bias_attention", pair, (q, bias), rate)

    qm = jnp.asarray(rng.randn(B, L, 512), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, L), jnp.float32)

    for rate in (0.0, 0.1):
        def masked(qm, _r=rate):
            o = pa.masked_attention_pallas(
                qm, qm, qm, mask, num_heads=8, dropout_rate=_r,
                dropout_rng=key, deterministic=(_r == 0.0))
            return ((o.astype(jnp.float32) ** 2).mean(),)
        run_family("masked_attention", masked, (qm,), rate)

    u = jnp.asarray(rng.rand(B, N, N) * 6, jnp.float32)
    means = jnp.asarray(rng.randn(K), jnp.float32)
    stds = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(K, K) * 0.1, jnp.float32)
    b1 = jnp.zeros((K,), jnp.float32)
    w2 = jnp.asarray(rng.randn(K, H) * 0.1, jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)

    def gbf(u, means, stds, w1, b1, w2, b2):
        out = pg.gbf_pair_bias_fused(u, means, stds, w1, b1, w2, b2,
                                     activation="gelu_tanh",
                                     out_dtype=jnp.bfloat16,
                                     compute_dtype=jnp.bfloat16)
        return ((out.astype(jnp.float32) ** 2).mean(),)
    run_family("gbf_pair_bias_fused", gbf, (u, means, stds, w1, b1, w2, b2), "-")

    print("ALL FAMILIES: compiled Mosaic inside shard_map == unmeshed, on chip")


if __name__ == "__main__":
    main()
