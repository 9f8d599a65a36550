"""Benchmark: finetune training throughput, molecules/sec/chip (ESOL-shaped).

Runs the full flagship training step (15L/512d/64H Uni-Mol encoder + ChemBERTa
+ cross-modal fusion, task MSE + InfoNCE + ConR losses, Adam update, bf16
compute) on ESOL-shaped synthetic batches: batch 32 (reference finetune.py
default), 64 atom positions, 64 SMILES tokens.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "mols/sec/chip", "vs_baseline": N}

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.json "published" is empty) and the PyTorch stack (unicore CUDA
kernels) cannot run in this environment, so the baseline is an *estimate* of
the reference pipeline on its intended single-GPU setup: a ~55M-param fp16
model at batch 32 with per-step time ~0.1-0.15s => ~250 molecules/sec.
BASELINE.md's north star is >=5x that (>=1250 mols/sec/chip).

Methodology: sustained throughput — long step chain with hard host syncs at
the boundaries.  (Short pipelined loops through the async dispatch queue
report up to 10x optimistic numbers; see CLAUDE.md.)

Hardware caveat: the tunneled chip is de-rated vs real v5e — measured
streaming HBM ~306-555 GB/s depending on layout (real v5e: 819) and >=50
TFLOPs effective bf16 matmul inside the step (real v5e: 197 peak).  The step
is a mix of matmul, VPU and HBM time (see scripts/trace_step.py for the
per-op profile), so real-v5e throughput should land ~1.5-3x the reported
value.  (Round 1's "1 TFLOPs / 104 GB/s bandwidth ceiling" calibration was
wrong — superseded by the xprof traces.)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ESTIMATED_REFERENCE_MOLS_PER_SEC = 250.0

# The headline benchmark is pinned at the reference finetune.py defaults
# (batch 32).  MMDTI_BENCH_BATCH/_ATOMS/_SMILES let perf probes measure
# other operating points with the same methodology without forking this
# file; the driver never sets them, so the recorded number stays B=32.
BATCH = int(os.environ.get("MMDTI_BENCH_BATCH", 32))
N_ATOMS = int(os.environ.get("MMDTI_BENCH_ATOMS", 64))
N_SMILES = int(os.environ.get("MMDTI_BENCH_SMILES", 64))
WARMUP = 5
STEPS = 200


def _analytic_hbm_bytes(model, n_params: int) -> float:
    """Analytic lower-bound accounting of HBM traffic per train step.

    Dominant residents (flagship 15L/512d/64H, B=32, N=64):
      * the layer-threaded pair-logit chain [B,H,N,N]: written once per layer
        in fwd, read by the next layer; read + grad-written again in bwd
        => ~4 x L x pair tensor;
      * the Gaussian edge features [B,N,N,K] (fwd write + read, bwd again);
      * params + Adam state: p/m/v read + write + grads => ~8 floats/param.
    Activations [B,N,E] are ~50x smaller and ignored, so achieved GB/s derived
    from this is a LOWER bound on true bandwidth utilization.
    """
    u = model.unimol_cfg
    pair_bytes = 2 if u.pair_dtype == "bfloat16" else 4
    pair = BATCH * u.attention_heads * N_ATOMS * N_ATOMS * pair_bytes
    chain = 4 * u.encoder_layers * pair
    gbf = 4 * BATCH * N_ATOMS * N_ATOMS * u.gaussian_kernels * 4
    par = n_params * 4 * 8
    return float(chain + gbf + par)


def _regression_vs_last(step_ms: float, repo_dir: str):
    """Compare this run's step time against the most recent BENCH_r*.json.

    Returns (pct_slower, prior_step_ms, prior_file) — pct_slower is
    (step_ms/prior - 1) * 100, positive = slower — or (None, None, None)
    when no prior record with a parsed step_ms exists.  A >10% positive
    value is surfaced loudly in the JSON line so a kernel change cannot
    silently eat the round-2/3 gains between rounds (VERDICT r3 item 7);
    the driver-recorded files are the ground truth being guarded."""
    import glob
    import re

    best = None
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            prior = float(parsed["step_ms"])
        except (OSError, ValueError, KeyError, TypeError):
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, prior, os.path.basename(path))
    if best is None:
        return None, None, None
    _, prior, fname = best
    if prior <= 0:
        return None, None, None
    return round((step_ms / prior - 1.0) * 100.0, 1), prior, fname


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_batch, _flagship
    from mmdti_tpu.losses.contrastive import ct_regress
    from mmdti_tpu.train import make_optimizer

    model = _flagship()
    batch_np = _example_batch(B=BATCH, N=N_ATOMS, L=N_SMILES)
    feats = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randn(BATCH, 1).astype("float32"))
    weights = jnp.ones((BATCH, 1), jnp.float32)

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
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

    # Two bytes/step figures, so round-over-round perf claims are falsifiable
    # against the measured ~104 GB/s chip ceiling (VERDICT r1 #10):
    #  * hlo_bytes_per_step — XLA cost model "bytes accessed" (pre-fusion op
    #    traffic; a big overestimate of HBM bytes, but a consistent RELATIVE
    #    measure: fusions that remove materialized tensors shrink it);
    #  * est_hbm_bytes_per_step — analytic accounting of the dominant HBM
    #    residents (see _analytic_hbm_bytes), used for achieved_gb_per_s.
    hlo_bytes = 0.0
    try:
        cost = train_step.lower(
            params, opt_state, feats, labels, weights, 0
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        hlo_bytes = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    est_hbm_bytes = _analytic_hbm_bytes(model, n_params)

    for i in range(WARMUP):
        params, opt_state, loss = train_step(params, opt_state, feats, labels, weights, i)
    float(loss)  # hard host sync drains the dispatch queue

    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt_state, loss = train_step(
            params, opt_state, feats, labels, weights, WARMUP + i
        )
    float(loss)  # hard sync: every step in the chain has completed
    dt = time.perf_counter() - t0

    mols_per_sec = BATCH * STEPS / dt
    step_s = dt / STEPS

    # inference forward (serving path): deterministic fwd, same chain method
    @jax.jit
    def infer_chain(c, p, feats):
        out = model.apply({"params": p}, **feats, deterministic=True)
        return c + out["logits"].sum()

    c = jnp.zeros(())
    for _ in range(10):
        c = infer_chain(c, params, feats)
    float(c)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        c = infer_chain(c, params, feats)
    float(c)
    infer_s = (time.perf_counter() - t0) / STEPS

    # the recorded BENCH_r*.json numbers are pinned at the default operating
    # point (B=32, N=L=64); comparing an overridden configuration against
    # them would fire a false PERF_REGRESSION_WARNING (e.g. B=64's 36.7ms
    # step is the EXPECTED number for that batch, not a regression)
    at_default = (BATCH, N_ATOMS, N_SMILES) == (32, 64, 64)
    reg_pct, prior_ms, prior_file = (
        _regression_vs_last(
            step_s * 1e3, os.path.dirname(os.path.abspath(__file__))
        )
        if at_default
        else (None, None, None)
    )
    reg_fields = {}
    if reg_pct is not None:
        reg_fields["regression_vs_last"] = reg_pct
        reg_fields["last_step_ms"] = prior_ms
        reg_fields["last_record"] = prior_file
        if reg_pct > 10.0:
            reg_fields["PERF_REGRESSION_WARNING"] = (
                f"step {step_s * 1e3:.2f}ms is {reg_pct:.1f}% slower than "
                f"{prior_file} ({prior_ms:.2f}ms)"
            )
    print(
        json.dumps(
            {
                "metric": "esol_finetune_train_throughput",
                "value": round(mols_per_sec, 2),
                "unit": "mols/sec/chip",
                "vs_baseline": round(mols_per_sec / ESTIMATED_REFERENCE_MOLS_PER_SEC, 3),
                "step_ms": round(step_s * 1e3, 2),
                **reg_fields,
                "inference_fwd_ms": round(infer_s * 1e3, 2),
                "inference_mols_per_sec": round(BATCH / infer_s, 1),
                "hlo_bytes_per_step": int(hlo_bytes),
                "est_hbm_bytes_per_step": int(est_hbm_bytes),
                "achieved_gb_per_s": round(est_hbm_bytes / step_s / 1e9, 2),
                "baseline_note": "vs_baseline divides by an ESTIMATED 250 "
                "mols/s for the torch reference on its intended single GPU "
                "(no published numbers; unicore cannot run here) — see module "
                "docstring",
            }
        )
    )


if __name__ == "__main__":
    main()
