"""Cold-start probe: does the persistent XLA compile cache eliminate the
fresh-process flagship compile on the axon TPU backend?

Round-2/3 lore (CLAUDE.md) said the axon backend does not serialize its big
TPU executables, so every fresh process pays the 240-300 s flagship
train-step remote compile.  The round-4 aot_probe found TPU-backed cache
entries on disk — including 46 MB `jit_train_step` executables — so this
probe answers the question directly: build the EXACT bench.py train step in
a fresh process and time `.lower().compile()` (no execution, no timing
loops), with the persistent cache on (default) or off
(MMDTI_COMPILE_CACHE=off).

Run twice:  python scripts/coldstart_probe.py   # cache as configured
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import functools

    t_import = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_batch, _flagship
    from mmdti_tpu.losses.contrastive import ct_regress
    from mmdti_tpu.train import make_optimizer

    model = _flagship()
    batch_np = _example_batch(B=32, N=64, L=64)
    feats = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randn(32, 1).astype("float32"))
    weights = jnp.ones((32, 1), jnp.float32)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = model.init({"params": key, "dropout": key}, **feats,
                        deterministic=True)["params"]
    t_init = time.perf_counter() - t0
    tx, _ = make_optimizer(1e-4, 10000, 0.03, 5.0)
    opt_state = tx.init(params)

    def loss_fn(p, feats, y, w, dropout_rng):
        out = model.apply(
            {"params": p}, **feats, deterministic=False,
            rngs={"dropout": dropout_rng},
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
    lowered = train_step.lower(params, opt_state, feats, labels, weights, 0)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    cache = jax.config.jax_compilation_cache_dir or "(off)"
    print(
        f"COLDSTART backend={jax.default_backend()} cache={cache} "
        f"init_s={t_init:.1f} lower_s={t_lower:.1f} "
        f"compile_s={t_compile:.1f} total_s={time.perf_counter()-t_import:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
