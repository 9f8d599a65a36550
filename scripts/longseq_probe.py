"""Flagship train step at long atom sequences (N=160/256): fused gbf kernel +
pallas-or-XLA attention fallback + remat, real chip."""
import functools, json, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _example_batch
from mmdti_tpu.models import build_model
from mmdti_tpu.losses.contrastive import ct_regress
from mmdti_tpu.train import make_optimizer

for N in (160, 256):
    from mmdti_tpu.ops.pallas_attention import pallas_attention_supported
    from mmdti_tpu.ops.pallas_gbf import gbf_fused_supported
    B = 32
    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=True,
        unimol_overrides={"pair_dtype": "bfloat16", "remat": bool(int(__import__("os").environ.get("MMDTI_PROBE_REMAT", "0")))},
    )
    feats = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=64).items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(B, 1), jnp.float32)
    weights = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
    tx, _ = make_optimizer(1e-4, 1000, 0.03, 5.0)
    opt = tx.init(params)

    def loss_fn(p, rng):
        out = model.apply({"params": p}, **feats, deterministic=False, rngs={"dropout": rng})
        return jnp.mean((out["logits"] - labels) ** 2) + 0.1 * out["infonce_loss"] + \
            0.1 * ct_regress(out["pooled"], labels, out["logits"], weights)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, i):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        loss, g = jax.value_and_grad(loss_fn)(p, rng)
        u, o = tx.update(g, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o, loss

    for i in range(5):
        params, opt, loss = step(params, opt, i)
    float(loss)
    t0 = time.perf_counter(); n = 60
    for i in range(n):
        params, opt, loss = step(params, opt, 5 + i)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "N": N, "step_ms": round(dt * 1e3, 2), "mols_s": round(B / dt, 1),
        "attn_pallas": pallas_attention_supported(64, 8, N),
        "gbf_fused": gbf_fused_supported(N, 128, 128, 64, "gelu_tanh"),
        "loss": float(loss),
    }))
    del params, opt, feats
