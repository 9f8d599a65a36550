"""Practical MXU ceiling of THIS (tunneled) chip at the train step's exact
matmul shapes — pins the denominator of the dense-bucket roofline verdict
(docs/PERF.md round-5 audit).  v5e nominal bf16 peak is 197 TFLOP/s; the
tunnel/de-rating makes the practical ceiling lower, and "dense matmuls are
at N% of floor" is only meaningful against the ceiling THIS chip reaches on
a pure dependent-matmul chain.

Methodology: long data-dependent chains with hard host syncs (the TIMING
TRAP, CLAUDE.md), difference-based ((t(3R) - t(R)) / 2R).

Usage: python scripts/matmul_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_rate(m, k, n, inner=100, reps=10, dtype=jnp.bfloat16):
    """Sustained TFLOP/s of x@W with a data dependency between iterations.

    The dependent chain runs INSIDE one jit (lax.fori_loop) — a first
    attempt chained separate jit calls and measured the per-dispatch launch
    overhead (~0.1 ms/op through the tunnel) instead of the matmul rate:
    [2048,512]x[512,512] read 10.9 TF op-chained vs the in-jit number
    below.  Inside a compiled step program there is no per-op launch, so
    the in-jit rate is the roofline denominator that matters."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.float32).astype(dtype)
    w = jnp.asarray(rng.randn(k, n), jnp.float32).astype(dtype)
    wb = jnp.asarray(rng.randn(n, k), jnp.float32).astype(dtype)

    @jax.jit
    def block(x):
        def body(_, y):
            return ((y @ w) @ wb).astype(dtype)
        return jax.lax.fori_loop(0, inner, body, x)

    jax.block_until_ready(block(x))

    def run(r):
        y = x
        t0 = time.perf_counter()
        for _ in range(r):
            y = block(y)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    t1 = run(reps)
    t2 = run(3 * reps)
    per = (t2 - t1) / (2 * reps) / inner
    flops = 2 * 2 * m * k * n  # two matmuls per loop iteration
    return flops / per / 1e12, per * 1e3


def main():
    print(f"backend={jax.default_backend()}")
    # the train step's dense shapes (B*N = 2048 tokens, E=512):
    shapes = [
        (2048, 512, 512, "attn out-proj / qkv slice"),
        (2048, 512, 1536, "fused in_proj (QKV)"),
        (2048, 512, 2048, "FFN fc1/fc2"),
        (4096, 4096, 4096, "large-square reference point"),
    ]
    for m, k, n, label in shapes:
        tf, ms = chain_rate(m, k, n)
        print(f"  [{m},{k}]x[{k},{n}] bf16: {tf:7.1f} TFLOP/s "
              f"({ms:.3f} ms/iter)  # {label}")


if __name__ == "__main__":
    main()
