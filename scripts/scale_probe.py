"""Scale-envelope probe: full train step of architectures LARGER than the
flagship (the reference's fixed 15L/512d/64H, /root/reference/models/
mm_model.py:325-343) on one chip.

Answers "does the framework hold up beyond the reference's model size" with
measured numbers: step time, params, remat decision (the arch-scaled policy
in train/nnmodel.py::pallas_remat_threshold), and derived mols/s.  Uses the
bench.py harness (long data-dependent step chain, hard host syncs at the
boundaries — the TIMING-TRAP-safe form; CLAUDE.md).

Usage:
  python scripts/scale_probe.py [layers dim heads ffn [batch N steps]]
Defaults: 24 768 96 3072 32 64 100 (~3.5x flagship encoder FLOPs).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_batch
from mmdti_tpu.losses.contrastive import ct_regress
from mmdti_tpu.models import build_model
from mmdti_tpu.train import make_optimizer
from mmdti_tpu.train.nnmodel import pallas_remat_threshold


def main():
    a = sys.argv[1:]
    layers, dim, heads, ffn = (int(x) for x in (a[:4] or [24, 768, 96, 3072]))
    batch, n_atoms, steps = (int(x) for x in (a[4:7] or [32, 64, 100]))

    on_tpu = jax.default_backend() == "tpu"
    thresh = pallas_remat_threshold(batch, heads, layers) if on_tpu else 160
    remat = n_atoms >= thresh
    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=on_tpu,
        unimol_overrides={
            "encoder_layers": layers, "embed_dim": dim, "ffn_embed_dim": ffn,
            "attention_heads": heads,
            "pair_dtype": "bfloat16" if on_tpu else "float32",
            "remat": remat,
        },
        # cross-modal fusion auto-tracks embed_dim (build_model); ChemBERTa
        # must match it so the two token streams concatenate
        chemberta_overrides={"hidden_size": dim, "intermediate_size": 4 * dim},
    )
    feats = {k: jnp.asarray(v) for k, v in _example_batch(B=batch, N=n_atoms).items()}
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randn(batch, 1).astype("float32"))
    weights = jnp.ones((batch, 1), jnp.float32)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"init: {time.perf_counter() - t0:.1f}s, params {n_params/1e6:.1f}M, "
          f"remat={remat} (threshold {thresh})", file=sys.stderr)
    tx, _ = make_optimizer(1e-4, 10000, 0.03, 5.0)
    opt_state = tx.init(params)

    def loss_fn(p, feats, y, w, dropout_rng):
        out = model.apply(
            {"params": p}, **feats, deterministic=False, rngs={"dropout": dropout_rng}
        )
        task = jnp.mean((out["logits"] - y) ** 2)
        ct = ct_regress(out["pooled"], y, out["logits"], w)
        return task + 0.1 * out["infonce_loss"] + 0.1 * ct

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, opt, feats, y, w, step):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(1), step)
        loss, grads = jax.value_and_grad(loss_fn)(p, feats, y, w, dropout_rng)
        updates, opt = tx.update(grads, opt, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, opt, loss

    t0 = time.perf_counter()
    for i in range(5):
        params, opt_state, loss = train_step(params, opt_state, feats, labels, weights, i)
    float(loss)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state, feats, labels, weights, 5 + i)
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "arch": f"{layers}L/{dim}d/{heads}H/{ffn}ffn",
        "params_m": round(n_params / 1e6, 1),
        "batch": batch, "n_atoms": n_atoms,
        "remat": remat,
        "step_ms": round(dt / steps * 1e3, 2),
        "mols_per_sec": round(batch * steps / dt, 1),
        "loss_finite": bool(np.isfinite(float(loss))),
    }))


if __name__ == "__main__":
    main()
