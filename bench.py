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


def _analytic_flops(model) -> float:
    """Analytic model FLOPs per train step (fwd + bwd), matmul terms only.

    MFU convention: bwd = 2x fwd matmul FLOPs; elementwise/softmax/optimizer
    work is excluded (it is VPU/HBM time, not MXU FLOPs).  XLA's own
    cost_analysis() cannot see inside pallas_call, so the compiled-step
    "flops" counter undercounts exactly the attention matmuls the Pallas
    path fuses — this analytic count is the honest numerator.
    """
    B, N, L = BATCH, N_ATOMS, N_SMILES

    def attn_block(layers, tokens, e, ffn, kv_tokens=None):
        kv = tokens if kv_tokens is None else kv_tokens
        qkvo = 2 * tokens * e * e + 2 * 2 * kv * e * e + 2 * tokens * e * e
        scores = 2 * tokens * kv * e * 2  # QK^T + probs@V
        f = 2 * 2 * tokens * e * ffn
        return layers * (qkvo + scores + f)

    u = model.unimol_cfg
    c = model.chemberta_cfg
    x = model.cross_cfg
    fwd = B * attn_block(u.encoder_layers, N, u.embed_dim, u.ffn_embed_dim)
    # gaussian edge MLP (K->K->H per pair) + final pair head projections
    K, H = u.gaussian_kernels, u.attention_heads
    fwd += 2 * B * N * N * (K * K + K * H)
    fwd += B * attn_block(c.num_hidden_layers, L, c.hidden_size,
                          c.intermediate_size)
    # cross-modal: two directed cross-attention stacks per layer
    fwd += B * attn_block(x.num_layers, N, x.hidden_size,
                          x.intermediate_size, kv_tokens=L)
    fwd += B * attn_block(x.num_layers, L, x.hidden_size,
                          x.intermediate_size, kv_tokens=N)
    return 3.0 * fwd  # fwd + 2x-fwd bwd


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
    from mmdti_tpu.train.optim import make_fused_apply

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
    # fused clip+Adam+apply — the Trainer's production update path
    # (bit-identical to tx.update + p+u under jit; one fusion per leaf)
    fused_apply = make_fused_apply(1e-4, 10000, 0.03, 5.0)

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
        p, opt = fused_apply(grads, opt, p)
        return p, opt, loss

    # Two bytes/step figures, so round-over-round perf claims are falsifiable
    # against the measured ~104 GB/s chip ceiling (VERDICT r1 #10):
    #  * hlo_bytes_per_step — XLA cost model "bytes accessed" (pre-fusion op
    #    traffic; a big overestimate of HBM bytes, but a consistent RELATIVE
    #    measure: fusions that remove materialized tensors shrink it);
    #  * est_hbm_bytes_per_step — analytic accounting of the dominant HBM
    #    residents (see _analytic_hbm_bytes), used for achieved_gb_per_s.
    hlo_bytes = 0.0
    hlo_flops = 0.0
    try:
        cost = train_step.lower(
            params, opt_state, feats, labels, weights, 0
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        hlo_bytes = float(cost.get("bytes accessed", 0.0))
        hlo_flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    est_hbm_bytes = _analytic_hbm_bytes(model, n_params)
    model_flops = _analytic_flops(model)

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
                # model FLOPs utilization, owned explicitly (VERDICT r4):
                # analytic matmul FLOPs (fwd + 2x bwd; _analytic_flops — the
                # XLA cost counter, also reported, cannot see inside
                # pallas_call) over nominal v5e bf16 peak 197 TFLOP/s.  The
                # step mixes matmul with VPU/HBM-bound phases (softmax,
                # dropout, optimizer, pair-logit streaming), so MFU is
                # structurally far below the ~28% the dense matmuls alone
                # achieve; the tunneled chip is also de-rated vs real v5e
                # (see module docstring), making this a conservative bound.
                "model_flops_per_step": int(model_flops),
                "hlo_flops_per_step": int(hlo_flops),
                "mfu_pct": round(100.0 * model_flops / step_s / 197e12, 2),
                "baseline_note": "vs_baseline divides by an ESTIMATED 250 "
                "mols/s for the torch reference on its intended single GPU "
                "(no published numbers; unicore cannot run here) — see module "
                "docstring",
            }
        )
    )


if __name__ == "__main__":
    main()
