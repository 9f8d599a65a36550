"""Real-TPU numerics check: N=160 pallas (q-row-blocked) vs XLA path."""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import functools
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _example_batch
from mmdti_tpu.models import build_model

B, N, L = 8, 160, 64

def mk(use_pallas):
    return build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=use_pallas,
        unimol_overrides={"pair_dtype": "float32", "encoder_layers": 4},
    )

feats = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=L).items()}
labels = jnp.asarray(np.random.RandomState(0).randn(B, 1), jnp.float32)
mx, mp = mk(False), mk(True)
key = jax.random.PRNGKey(0)
params = mx.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]

def loss(model, p, feats, labels):
    out = model.apply({"params": p}, **feats, deterministic=True)
    return jnp.mean((out["logits"] - labels) ** 2) + 0.01 * out["infonce_loss"]

f_x = jax.jit(jax.value_and_grad(functools.partial(loss, mx)))
f_p = jax.jit(jax.value_and_grad(functools.partial(loss, mp)))
lx, gx = f_x(params, feats, labels)
lp, gp = f_p(params, feats, labels)
print("loss xla", float(lx), "pallas", float(lp))
assert np.isfinite(float(lx)) and np.isfinite(float(lp))
np.testing.assert_allclose(float(lp), float(lx), rtol=2e-3)
# scale-aware: normalize by each tensor's own magnitude, floored at 1e-3 of
# the global gradient scale (softmax shift-invariance makes some bias grads
# truly ~0; noise-vs-noise there is not an error)
gscale = max(float(np.abs(np.asarray(l, np.float32)).max())
             for l in jax.tree_util.tree_leaves(gx))
worst, wpath = 0.0, None
for (path, ax), (_, ap) in zip(
    jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves_with_path(gp)
):
    a, b = np.asarray(ax, np.float32), np.asarray(ap, np.float32)
    denom = max(np.abs(a).max(), 1e-3 * gscale) + 1e-12
    rel = np.abs(a - b).max() / denom
    if rel > worst:
        worst, wpath = rel, jax.tree_util.keystr(path)
print("worst scale-aware grad diff:", worst, "at", wpath)
assert worst < 0.05, (worst, wpath)  # bf16 end-to-end envelope
print("LONGSEQ EQUIVALENCE OK")
