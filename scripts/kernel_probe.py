"""Standalone timing of the fused pair-bias attention kernels (fwd+bwd) —
isolates kernel changes from the ~10-minute full-model compile at N=256.

Mimics the encoder's real use inside ONE jit: 15 layers threading the logits
chain (so per-dispatch tunnel latency is amortized exactly as in the model).
Reports per-layer fwd and fwd+bwd times via difference-based chain timing.

Usage: python scripts/kernel_probe.py [N] [rate ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmdti_tpu.ops import pallas_attention as pa

B, H, D, LAYERS = 32, 64, 8, 15


def probe(N: int, rate: float):
    E = H * D
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, E).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.asarray(
        (rng.randn(B, H, N, N) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def stack(q, bias):
        x, b = q, bias
        for _ in range(LAYERS):
            o, l = pa.pair_bias_attention_pallas(
                x, x, x, b, num_heads=H, dropout_rate=rate, dropout_rng=key,
                deterministic=(rate == 0.0), pair_dtype=jnp.bfloat16,
            )
            x, b = o, l
        return (x.astype(jnp.float32) ** 2).mean() + 1e-3 * (
            b.astype(jnp.float32) ** 2
        ).mean()

    grad = jax.jit(jax.value_and_grad(stack))
    fwd_only = jax.jit(stack)

    def chain(fn, n):
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            # keep the perturbed input in the production dtype (bf16 * f32
            # scalar would silently promote and time fp32-I/O kernels)
            r = fn((q * (1 + c * 1e-12)).astype(q.dtype), bias)
            c = (r[0] if isinstance(r, tuple) else r).astype(jnp.float32)
        float(c)
        return time.perf_counter() - t0

    out = {"N": N, "rate": rate, "policy": pa._chunk_policy(H, N, N, D)}
    for name, fn, reps in (("fwdbwd", grad, (10, 40)), ("fwd", fwd_only, (20, 80))):
        chain(fn, 2)  # compile + warm
        t1 = chain(fn, reps[0])
        t2 = chain(fn, reps[1])
        per_call = (t2 - t1) / (reps[1] - reps[0])
        out[f"{name}_ms_per_layer"] = round(per_call / LAYERS * 1e3, 3)
    out["bwd_ms_per_layer_est"] = round(
        out["fwdbwd_ms_per_layer"] - out["fwd_ms_per_layer"], 3
    )
    return out


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rates = [float(a) for a in sys.argv[2:]] or [0.1, 0.0]
    for r in rates:
        print(json.dumps(probe(N, r)))
