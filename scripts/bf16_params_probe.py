"""A/B: serving forward with fp32 vs bf16 resident params (flagship).

Compute is already bf16 (flax casts weights per-use); storing the resident
serving params in bf16 halves the ~296MB of weight HBM reads per forward and
the resident footprint.  This probe measures whether that cashes as wall
time on the real chip (chain timing per CLAUDE.md: >=200 sequential
data-dependent calls, hard host syncs at both boundaries).

Usage: python scripts/bf16_params_probe.py [B] [N] [L] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_batch, _flagship

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    model = _flagship()
    feats = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=L).items()}
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            **feats, deterministic=True,
        )
    )["params"]
    host_rng = np.random.RandomState(0)
    params32 = jax.device_put(jax.tree.map(
        lambda s: (host_rng.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
    ))
    params16 = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params32
    ))
    nbytes = lambda t: sum(x.nbytes for x in jax.tree.leaves(t))
    print(f"backend={jax.default_backend()} B={B} N={N} L={L} "
          f"params fp32={nbytes(params32)/1e6:.0f}MB bf16={nbytes(params16)/1e6:.0f}MB")

    @jax.jit
    def chain(c, p, feats):
        out = model.apply({"params": p}, **feats, deterministic=True)
        return c + out["logits"].astype(jnp.float32).sum()

    for name, p in (("fp32_params", params32), ("bf16_params", params16)):
        c = jnp.zeros(())
        for _ in range(10):
            c = chain(c, p, feats)
        float(c)  # hard sync
        t0 = time.perf_counter()
        c = jnp.zeros(())
        for _ in range(steps):
            c = chain(c, p, feats)
        float(c)
        dt = (time.perf_counter() - t0) / steps
        print(f"{name:12s} fwd {dt*1e3:7.3f} ms  {B/dt:8.1f} mols/s")


if __name__ == "__main__":
    main()
