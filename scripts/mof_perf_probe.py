"""MOF train-step perf on the real chip (VERDICT r4 #5: 'MOF has
correctness but no perf treatment').

Measures, at MOF-realistic shapes (crystals crop to hundreds of atoms):
  1. the MOF train step (MOFModel fwd + MSE + Adam, bf16, Pallas path) with
     DEVICE pair featurization (round-5: mof_pair_feats_from_coords — the
     collator now ships [B,N,3] coords for MOF too);
  2. the same step fed host [B,N,N] distance/edge arrays (the round-4 path);
  3. the per-batch H2D transfer cost of each input set through the tunnel
     (difference-based — block_until_ready lies on short chains, CLAUDE.md),
     which is what the device path actually buys: at N=256 the host pair
     arrays are ~100x the coord bytes.

Usage: python scripts/mof_perf_probe.py [B] [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def synth_batch(rng, vocab=35, pad=1):
    toks = rng.randint(4, vocab - 1, (B, N)).astype(np.int32)
    toks[:, 0] = 0
    # ragged real lengths; EOS at n_real-1, pads after
    n_real = rng.randint(int(N * 0.7), N + 1, B)
    coords = (rng.randn(B, N, 3) * 6).astype(np.float32)
    for i, n in enumerate(n_real):
        toks[i, n - 1] = 2
        toks[i, n:] = pad
        coords[i, 0] = 0.0
        coords[i, n - 1:] = 0.0
    feats_dev = {
        "src_tokens": toks,
        "src_coord": coords,
        "gas_id": rng.randint(0, 400, B).astype(np.int32),
        "gas_attr": rng.randn(B, 6).astype(np.float32),
        "pressure": rng.rand(B).astype(np.float32) * 50,
        "temperature": (rng.rand(B).astype(np.float32) * 200 + 150),
    }
    # host pair arrays with the MOF semantics (inner atoms only)
    from mmdti_tpu.ops.pair_feats import mof_pair_feats_from_coords

    dist, edge = mof_pair_feats_from_coords(
        jnp.asarray(toks), jnp.asarray(coords), vocab, pad
    )
    feats_host = {k: v for k, v in feats_dev.items() if k != "src_coord"}
    feats_host["src_distance"] = np.asarray(dist)
    feats_host["src_edge_type"] = np.asarray(edge)
    return feats_dev, feats_host


def chain_step_time(step, params, opt, feats, labels, warm=5, steps=60):
    for i in range(warm):
        params, opt, loss = step(params, opt, feats, labels, i)
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, loss = step(params, opt, feats, labels, warm + i)
    float(loss)
    return (time.perf_counter() - t0) / steps


def transfer_ms(tree, reps_a=8, reps_b=24):
    """Difference-based H2D cost of device_put on this tree."""
    def run(r):
        t0 = time.perf_counter()
        out = None
        for _ in range(r):
            out = jax.device_put(tree)
            jax.block_until_ready(out)
        return time.perf_counter() - t0
    run(2)
    t1 = run(reps_a)
    t2 = run(reps_b)
    return (t2 - t1) / (reps_b - reps_a) * 1e3


def main():
    from mmdti_tpu.models.mof import build_mof_model
    from mmdti_tpu.train import make_optimizer
    from mmdti_tpu.train.optim import make_fused_apply

    print(f"backend={jax.default_backend()} B={B} N={N}")
    rng = np.random.RandomState(0)
    feats_dev, feats_host = synth_batch(rng)
    labels = jnp.asarray(rng.randn(B, 1), jnp.float32)

    model = build_mof_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        compute_dtype="bfloat16", use_pallas=True,
        unimol_overrides={"pair_dtype": "bfloat16"},
    )
    fd = {k: jnp.asarray(v) for k, v in feats_dev.items()}
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = model.init({"params": key, "dropout": key}, **fd,
                        deterministic=True)["params"]
    print(f"init: {time.time()-t0:.1f}s "
          f"({sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))/1e6:.1f}M params)")
    tx, _ = make_optimizer(1e-4, 10000, 0.03, 5.0)
    fused = make_fused_apply(1e-4, 10000, 0.03, 5.0)
    opt = tx.init(params)

    def make_step():
        def loss_fn(p, feats, y, drng):
            out = model.apply({"params": p}, **feats, deterministic=False,
                              rngs={"dropout": drng})
            return jnp.mean((out["logits"] - y) ** 2)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, feats, y, i):
            drng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            loss, grads = jax.value_and_grad(loss_fn)(p, feats, y, drng)
            p, o = fused(grads, o, p)
            return p, o, loss
        return step

    for name, feats in (("device-pair-feats", feats_dev),
                        ("host-pair-arrays", feats_host)):
        fd = {k: jnp.asarray(v) for k, v in feats.items()}
        t0 = time.time()
        step = make_step()
        s = chain_step_time(step, params, opt, fd, labels)
        # params/opt were donated; rebuild for the next variant
        params = model.init({"params": key, "dropout": key},
                            **{k: jnp.asarray(v) for k, v in feats_dev.items()},
                            deterministic=True)["params"]
        opt = tx.init(params)
        mb = sum(np.asarray(v).nbytes for v in feats.values()) / 1e6
        tx_ms = transfer_ms(feats)
        print(f"{name:18s}: step {s*1e3:7.2f} ms ({B/s:7.1f} mols/s/chip)  "
              f"inputs {mb:7.1f} MB  H2D {tx_ms:7.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
