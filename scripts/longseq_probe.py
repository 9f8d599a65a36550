"""Flagship train step at long atom sequences (N=160/256) on the real chip:
fused gbf kernel + q-row-blocked pallas attention (or XLA fallback) + optional
remat (MMDTI_PROBE_REMAT=1).  Difference-based sustained timing per the
CLAUDE.md methodology."""

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
from mmdti_tpu.ops.pallas_attention import pallas_attention_supported
from mmdti_tpu.ops.pallas_gbf import gbf_fused_supported
from mmdti_tpu.train import make_optimizer

B = int(os.environ.get("MMDTI_PROBE_B", "32"))
REMAT = bool(int(os.environ.get("MMDTI_PROBE_REMAT", "0")))


def probe(N: int) -> dict:
    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=True,
        unimol_overrides={"pair_dtype": "bfloat16", "remat": REMAT},
    )
    L = int(os.environ.get("MMDTI_PROBE_L", "64"))
    feats = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=L).items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(B, 1), jnp.float32)
    weights = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, **feats, deterministic=True
    )["params"]
    tx, _ = make_optimizer(1e-4, 1000, 0.03, 5.0)
    opt = tx.init(params)

    def loss_fn(p, feats, labels, weights, rng):
        out = model.apply(
            {"params": p}, **feats, deterministic=False, rngs={"dropout": rng}
        )
        return (
            jnp.mean((out["logits"] - labels) ** 2)
            + 0.1 * out["infonce_loss"]
            + 0.1 * ct_regress(out["pooled"], labels, out["logits"], weights)
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, feats, labels, weights, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        loss, g = jax.value_and_grad(loss_fn)(p, feats, labels, weights, rng)
        u, o = tx.update(g, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o, loss

    def run(state, n, i0):
        params, opt = state
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, opt, loss = step(params, opt, feats, labels, weights, i0 + i)
        float(loss)  # hard host sync
        return time.perf_counter() - t0, (params, opt), loss

    state = (params, opt)
    _, state, loss = run(state, 5, 0)          # compile + warm
    t1, state, _ = run(state, 40, 100)
    t2, state, loss = run(state, 160, 200)
    dt = (t2 - t1) / 120
    return {
        "N": N, "step_ms": round(dt * 1e3, 2), "mols_s": round(B / dt, 1),
        "remat": REMAT,
        "attn_pallas": pallas_attention_supported(64, 8, N),
        "gbf_fused": gbf_fused_supported(N, 128, 128, 64, "gelu_tanh"),
        "loss": float(loss),
    }


if __name__ == "__main__":
    lengths = [int(a) for a in sys.argv[1:]] or [160, 256]
    for n in lengths:
        print(json.dumps(probe(n)))
