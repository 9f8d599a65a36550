"""Perf probes for the flagship train step (run on the real chip).

Usage: python scripts/perf_probe.py <probe> [<probe> ...]

Probes:
  params        count params by subtree
  copy_layouts  elementwise-copy GB/s for pair-tensor layouts (minor 64 vs 128)
  fwd           full-model fwd: fp32 vs bf16 pair_dtype
  step          full train step: fp32 vs bf16 pair_dtype
  chain         isolated 15-layer pair-logit chain fwd+bwd, fp32 vs bf16
  opt           adam update alone: fp32 vs bf16 m/v state

Timing follows CLAUDE.md's honest methodology: difference-based long chains
(t(N2)-t(N1))/(N2-N1) with hard host syncs at the boundaries.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, L, H, D, E, LAYERS, K = 32, 64, 64, 64, 8, 512, 15, 128


def timed_chain(step, state, n1=100, n2=300):
    """Difference-based sustained timing of a state -> state step.

    State threads through continuously (donation-safe); each measured segment
    is bounded by hard host syncs."""
    def sync(s):
        leaf = jax.tree.leaves(s)[0]
        float(leaf.reshape(-1)[0])  # device-side index; pulls one scalar

    def run(s, n):
        sync(s)
        t0 = time.perf_counter()
        for i in range(n):
            s = step(s, i)
        sync(s)
        return time.perf_counter() - t0, s

    s = state
    for i in range(10):  # compile + warm
        s = step(s, i)
    t1, s = run(s, n1)
    t2, s = run(s, n2)
    return (t2 - t1) / (n2 - n1)


def probe_params():
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship()
    batch = {k: jnp.asarray(v) for k, v in _example_batch(B=2, N=8, L=8).items()}
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, **batch, deterministic=True)["params"]
    total = 0
    for name, sub in params.items():
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(sub))
        total += n
        print(f"  {name:28s} {n/1e6:8.2f}M")
    print(f"  {'TOTAL':28s} {total/1e6:8.2f}M")


def probe_copy_layouts():
    shapes = {
        "[B,H,N,N] f32 (minor 64)": ((B, H, N, N), jnp.float32),
        "[B,H,N/2,128] f32": ((B, H, N // 2, 128), jnp.float32),
        "[B*H*N*N/128,128] f32": ((B * H * N * N // 128, 128), jnp.float32),
        "[B,H,N,N] bf16 (minor 64)": ((B, H, N, N), jnp.bfloat16),
        "[B,H,N/2,128] bf16": ((B, H, N // 2, 128), jnp.bfloat16),
        "[B*H*N*N/128,128] bf16": ((B * H * N * N // 128, 128), jnp.bfloat16),
    }
    for name, (shape, dtype) in shapes.items():
        x = jnp.asarray(np.random.RandomState(0).randn(*shape), dtype)

        @jax.jit
        def step(s, i):
            return s * 1.000001 + 0.000001

        dt = timed_chain(step, x)
        nbytes = np.prod(shape) * x.dtype.itemsize
        print(f"  {name:28s} {dt*1e3:7.3f} ms  {2*nbytes/dt/1e9:7.1f} GB/s (r+w)")


def _model_and_batch(pair_dtype, use_pallas=False):
    from __graft_entry__ import _example_batch, _flagship
    from mmdti_tpu.models import build_model

    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=use_pallas,
        unimol_overrides={"pair_dtype": pair_dtype},
    )
    batch = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=L).items()}
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, **batch, deterministic=True)["params"]
    return model, batch, params


def probe_fwd():
    for pd in ("float32", "bfloat16"):
        model, batch, params = _model_and_batch(pd)

        @jax.jit
        def fwd(x, i):
            out = model.apply({"params": params}, **batch, deterministic=True)
            return x + out["logits"].sum()

        dt = timed_chain(fwd, jnp.zeros(()))
        print(f"  fwd pair_dtype={pd:9s} {dt*1e3:7.2f} ms")


def probe_serve():
    """Serving throughput: fused-Pallas inference forward vs batch size."""
    global B
    from __graft_entry__ import _example_batch
    from mmdti_tpu.models import build_model

    saved = B
    for bsz in (32, 64, 128, 256):
        B = bsz
        model, batch, params = _model_and_batch("bfloat16", use_pallas=True)

        # params/batch passed as ARGS: closing over them embeds them as
        # constants and blows the remote-compile request limit (HTTP 413)
        @jax.jit
        def fwd(x, params, batch, i):
            out = model.apply({"params": params}, **batch, deterministic=True)
            return x + out["logits"].sum()

        n1, n2 = (100, 300) if bsz <= 64 else (30, 90)
        dt = timed_chain(
            lambda s, i: fwd(s, params, batch, i), jnp.zeros(()), n1=n1, n2=n2
        )
        print(f"  serve B={bsz:4d}  {dt*1e3:7.2f} ms  {bsz/dt:8.0f} mols/s")
    B = saved


def probe_step():
    from mmdti_tpu.losses.contrastive import ct_regress
    from mmdti_tpu.train import make_optimizer

    variants = [("float32", False), ("float32", True), ("bfloat16", False), ("bfloat16", True)]
    for pd, pallas in variants:
        model, batch, params = _model_and_batch(pd, use_pallas=pallas)
        labels = jnp.asarray(np.random.RandomState(0).randn(B, 1), jnp.float32)
        weights = jnp.ones((B, 1), jnp.float32)
        tx, _ = make_optimizer(1e-4, 10000, 0.03, 5.0)
        opt_state = tx.init(params)

        def loss_fn(p, rng):
            out = model.apply({"params": p}, **batch, deterministic=False,
                              rngs={"dropout": rng})
            task = jnp.mean((out["logits"] - labels) ** 2)
            ct = ct_regress(out["pooled"], labels, out["logits"], weights)
            return task + 0.1 * out["infonce_loss"] + 0.1 * ct

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, opt, i):
            rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
            loss, grads = jax.value_and_grad(loss_fn)(p, rng)
            updates, opt = tx.update(grads, opt, p)
            return jax.tree.map(lambda a, u: a + u, p, updates), opt, loss

        def chain_step(s, i):
            p, opt = s
            p, opt, _ = step(p, opt, i)
            return (p, opt)

        dt = timed_chain(chain_step, (params, opt_state), n1=60, n2=200)
        print(f"  step pair_dtype={pd:9s} pallas={pallas!s:5s} "
              f"{dt*1e3:7.2f} ms  ({B/dt:.0f} mols/s)")


def probe_chain():
    """Isolated pair-logit threading: 15x (logits = qk+bias; bias = logits)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    bias0 = jnp.asarray(rng.randn(B, H, N, N), jnp.float32)

    for pd in (jnp.float32, jnp.bfloat16):
        def fwd_loss(bias):
            b = bias.astype(pd)
            out_sum = 0.0
            for _ in range(LAYERS):
                logits = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * D**-0.5,
                                    k.astype(jnp.float32),
                                    preferred_element_type=jnp.float32)
                logits = logits + b.astype(jnp.float32)
                p = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bhnm,bhmd->bhnd", p, v,
                               preferred_element_type=jnp.float32)
                out_sum = out_sum + o.sum()
                b = logits.astype(pd)
            return out_sum + b.astype(jnp.float32).sum()

        g = jax.jit(jax.grad(fwd_loss))

        @jax.jit
        def step(s, i):
            return s + g(bias0 + s * 1e-9).sum() * 1e-9

        dt = timed_chain(step, jnp.zeros(()), n1=50, n2=150)
        print(f"  chain fwd+bwd pair_dtype={pd.__name__:9s} {dt*1e3:7.2f} ms")


def probe_opt():
    import optax

    n = 74_000_000
    g = jnp.ones((n,), jnp.float32) * 1e-4
    for mu_dtype in (None, jnp.bfloat16):
        p = jnp.zeros((n,), jnp.float32)
        tx = optax.adam(1e-4, mu_dtype=mu_dtype)
        opt = tx.init(p)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, opt, i):
            u, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt

        def chain(s, i):
            return step(s[0], s[1], i)

        dt = timed_chain(chain, (p, opt), n1=30, n2=90)
        print(f"  adam mu_dtype={str(mu_dtype):20s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    for probe in sys.argv[1:]:
        print(f"== {probe} ==")
        globals()[f"probe_{probe}"]()
