"""Probe: can the 240-300s fresh-process remote compile be amortized?
(VERDICT r3 item 5.)

Three candidate mechanisms, each measured against the axon-tunneled TPU:

  1. persistent compilation cache (jax_compilation_cache_dir) — does the
     axon backend serialize TPU executables at all?  (CLAUDE.md: it caches
     CPU executables only; confirm programmatically.)
  2. jax.export AOT serialization: export in process A, deserialize + run in
     a fresh process B.  If the backend accepts it, serving cold-start can
     snapshot its bucketed executables.
  3. (diagnostic) time a plain jit warmup as the baseline cold-start.

Run:  python scripts/aot_probe.py [--stage export|import|cache|all]
The import stage re-execs itself in a fresh process so the measurement is an
honest cold start.

Findings are summarized in docs/PERF.md ("fresh-process compile").
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOB = "/tmp/mmdti_aot_probe.bin"

# small-but-real model: 2L/512d forward (the serving shape class); the
# flagship 15L train step would make every failed attempt cost 5 minutes
ARCH = dict(
    unimol_overrides={
        "encoder_layers": 2, "embed_dim": 512, "ffn_embed_dim": 2048,
        "attention_heads": 64,
    },
    chemberta_overrides={
        "hidden_size": 512, "num_hidden_layers": 2,
        "num_attention_heads": 8, "intermediate_size": 2048,
    },
)


def _model_and_args():
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from mmdti_tpu.models import build_model

    model = build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=300, compute_dtype="bfloat16",
        use_pallas=jax_backend() == "tpu", **ARCH,
    )
    batch = {k: jnp.asarray(v) for k, v in _example_batch(B=8, N=64, L=64).items()}
    return model, batch


def jax_backend():
    import jax

    return jax.default_backend()


def _init_params(model, batch):
    import jax

    key = jax.random.PRNGKey(0)
    return model.init({"params": key, "dropout": key}, **batch,
                      deterministic=True)["params"]


def _fwd(model):
    def fwd(params, batch):
        return model.apply({"params": params}, **batch, deterministic=True)["logits"]

    return fwd


def stage_cache():
    """Does the persistent compilation cache store THIS backend's executables?"""
    import jax

    cache_dir = "/tmp/mmdti_aot_probe_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    model, batch = _model_and_args()
    params = _init_params(model, batch)
    t0 = time.perf_counter()
    out = jax.jit(_fwd(model))(params, batch)
    out.block_until_ready()
    t1 = time.perf_counter()
    entries = []
    for root, _, files in os.walk(cache_dir):
        entries += [os.path.join(root, f) for f in files]
    total = sum(os.path.getsize(p) for p in entries)
    print(f"CACHE backend={jax_backend()} compile_s={t1 - t0:.1f} "
          f"entries={len(entries)} bytes={total}", flush=True)


def stage_export():
    import jax
    from jax import export as jexport

    model, batch = _model_and_args()
    params = _init_params(model, batch)
    fwd = _fwd(model)
    t0 = time.perf_counter()
    try:
        exp = jexport.export(jax.jit(fwd))(params, batch)
        blob = exp.serialize()
    except Exception as e:
        print(f"EXPORT_FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
        return False
    t1 = time.perf_counter()
    with open(BLOB, "wb") as f:
        f.write(blob)
    print(f"EXPORT ok bytes={len(blob)} export_s={t1 - t0:.1f}", flush=True)
    # does calling the exported artifact skip compilation in THIS process?
    t2 = time.perf_counter()
    try:
        out = exp.call(params, batch)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        print(f"EXPORT_CALL ok first_call_s={t3 - t2:.1f}", flush=True)
    except Exception as e:
        print(f"EXPORT_CALL_FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
    return True


def stage_import():
    """Fresh process: deserialize + first call. Honest cold-start numbers."""
    import jax
    from jax import export as jexport

    t_pre = time.perf_counter()
    model, batch = _model_and_args()
    params = _init_params(model, batch)  # params init compiles a tiny program
    with open(BLOB, "rb") as f:
        blob = f.read()
    t0 = time.perf_counter()
    exp = jexport.deserialize(blob)
    t1 = time.perf_counter()
    try:
        out = exp.call(params, batch)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        print(f"IMPORT ok deserialize_s={t1 - t0:.1f} first_call_s={t2 - t1:.1f} "
              f"(setup_s={t0 - t_pre:.1f})", flush=True)
    except Exception as e:
        print(f"IMPORT_CALL_FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
    # baseline in the SAME fresh process: plain jit compile of the same fn
    t3 = time.perf_counter()
    out = jax.jit(_fwd(model))(params, batch)
    jax.block_until_ready(out)
    t4 = time.perf_counter()
    print(f"BASELINE_JIT compile_s={t4 - t3:.1f}", flush=True)


def main():
    stage = sys.argv[sys.argv.index("--stage") + 1] if "--stage" in sys.argv else "all"
    if stage in ("cache",):
        stage_cache()
        return
    if stage == "export":
        stage_export()
        return
    if stage == "import":
        stage_import()
        return
    # all: export here, then re-exec a fresh process for the import timing
    ok = stage_export()
    if ok:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", "import"],
            capture_output=True, text=True, timeout=1800,
        )
        print(proc.stdout, end="", flush=True)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr, flush=True)
    stage_cache()


if __name__ == "__main__":
    main()
