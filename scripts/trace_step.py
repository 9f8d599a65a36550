"""Capture an xprof trace of the flagship train step and print the op-level
time breakdown (parses the perfetto trace.json.gz the profiler writes).

Usage: python scripts/trace_step.py [pair_dtype] [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MMDTI_TRACE_B", "32"))
N = int(os.environ.get("MMDTI_TRACE_N", "64"))
L = int(os.environ.get("MMDTI_TRACE_L", "64"))


def main():
    pair_dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    use_pallas = len(sys.argv) > 3 and sys.argv[3] == "pallas"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mmdti_trace"

    from __graft_entry__ import _example_batch
    from mmdti_tpu.losses.contrastive import ct_regress
    from mmdti_tpu.models import build_model
    from mmdti_tpu.train import make_optimizer

    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16", use_pallas=use_pallas,
        unimol_overrides={"pair_dtype": pair_dtype},
    )
    batch = {k: jnp.asarray(v) for k, v in _example_batch(B=B, N=N, L=L).items()}
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, **batch, deterministic=True)["params"]
    labels = jnp.asarray(np.random.RandomState(0).randn(B, 1), jnp.float32)
    weights = jnp.ones((B, 1), jnp.float32)
    tx, _ = make_optimizer(1e-4, 10000, 0.03, 5.0)
    opt_state = tx.init(params)
    from mmdti_tpu.train.optim import make_fused_apply

    fused_apply = make_fused_apply(1e-4, 10000, 0.03, 5.0)  # production path

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
        p, opt = fused_apply(grads, opt, p)
        return p, opt, loss

    for i in range(8):  # compile + warm
        params, opt_state, loss = step(params, opt_state, i)
    float(loss)

    with jax.profiler.trace(outdir):
        for i in range(10):
            params, opt_state, loss = step(params, opt_state, 100 + i)
        float(loss)

    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print("no trace.json.gz found under", outdir)
        files = glob.glob(os.path.join(outdir, "**", "*"), recursive=True)
        for f in files:
            print(" ", f)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # find device-side tracks (TPU op events carry 'dur' and a pid mapped to
    # the device); aggregate complete events by name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total_by_pid = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pid_names.get(e.get("pid"), "")
            total_by_pid[pname] += e["dur"]
            if "TPU" in pname or "/device" in pname.lower() or "xla" in pname.lower():
                by_name[e["name"]] += e["dur"]
    print("== tracks ==")
    for pname, dur in sorted(total_by_pid.items(), key=lambda kv: -kv[1]):
        print(f"  {pname[:60]:60s} {dur/1e3:9.2f} ms")
    if not by_name:
        # fall back: aggregate everything
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                by_name[e["name"]] += e["dur"]
    print("== top ops (10 steps) ==")
    items = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    total = sum(by_name.values())
    for name, dur in items:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:90]}")
    print(f"  total {total/1e3:.2f} ms over 10 steps")


if __name__ == "__main__":
    main()
