"""Real-chip MolServe probe: end-to-end serving latency/throughput.

Builds a flagship-architecture experiment dir with random-init weights (no
training needed to measure serving), stands up MolServe, and measures
per-request wall latency — each predict() is a full host round trip
(featurize -> pad -> dispatch -> pull), so sequential request timing is
honest even through the axon tunnel (every request hard-syncs on the
np.asarray pull; no async-dispatch pipelining to lie about).

Usage: python scripts/serve_probe.py [--requests 50] [--skip-http]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",                      # aspirin
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",                 # ibuprofen
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",               # caffeine
    "c1ccc2c(c1)ccc1ccccc21",                     # phenanthrene
    "CC(N)Cc1ccccc1",                             # amphetamine
    "OC(=O)c1ccccc1O",                            # salicylic acid
    "ClC(Cl)=C(c1ccc(Cl)cc1)c1ccc(Cl)cc1",        # DDT
    "CCN(CC)C(=O)C1CN(C)C2Cc3c[nH]c4cccc(C2=C1)c34",  # LSD-like
]


def build_flagship_exp(exp_dir: str, coord_provider: str = "auto") -> None:
    import jax
    import numpy as np

    from mmdti_tpu.configs.config import default_config, save_yaml
    from mmdti_tpu.train.trainer import save_checkpoint
    from mmdti_tpu.api.serve_api import MolServe  # noqa: F401 (import check)
    from mmdti_tpu.chem.dictionary import Dictionary
    from mmdti_tpu.chem.tokenizer import load_tokenizer
    from mmdti_tpu.models.mm_model import build_model

    cfg = default_config()
    cfg.task = "regression"
    cfg.coord_provider = coord_provider  # host vs device conformer A/B
    cfg.target_cols = "measured"
    cfg.num_classes = 1
    cfg.use_scaler = False
    save_yaml(cfg, os.path.join(exp_dir, "config.yaml"))

    dictionary = Dictionary.load(None)
    dictionary.add_symbol("[MASK]", is_special=True)
    tokenizer = load_tokenizer(None)
    model = build_model(
        output_dim=1, atom_vocab_size=len(dictionary),
        atom_pad_idx=dictionary.pad(), task="regression",
        smiles_vocab_size=getattr(tokenizer, "vocab_size", 600),
        compute_dtype="bfloat16",
        unimol_overrides={"pair_dtype": "bfloat16"},
    )
    rng = jax.random.PRNGKey(0)
    dummy = {
        "src_tokens": np.zeros((1, 32), np.int32),
        "src_distance": np.zeros((1, 32, 32), np.float32),
        "src_edge_type": np.zeros((1, 32, 32), np.int32),
        "input_ids": np.ones((1, 32), np.int32),
        "attention_mask": np.ones((1, 32), np.int32),
    }
    # eval_shape only: no init executable is ever compiled or run — random
    # values are fine for a latency probe, and the flagship init compile
    # through the tunnel costs minutes we don't need to pay.
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, **dummy, deterministic=True)
    )["params"]
    host_rng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: (host_rng.standard_normal(s.shape) * 0.02).astype(s.dtype),
        shapes,
    )
    save_checkpoint(exp_dir, 0, params, None)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"flagship exp dir built: {n/1e6:.1f}M params", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip-http", action="store_true")
    ap.add_argument("--coord-provider", default="auto",
                    choices=["auto", "host", "device"],
                    help="conformer refinement placement (PERF.md p50/p95 "
                         "table A/B; 'auto' = device on TPU without RDKit)")
    args = ap.parse_args()

    from mmdti_tpu import MolServe

    with tempfile.TemporaryDirectory() as exp:
        build_flagship_exp(exp, coord_provider=args.coord_provider)
        t0 = time.time()
        srv = MolServe(exp)
        print(f"MolServe init: {time.time()-t0:.1f}s", flush=True)

        # ---- warm the full B=1 bucket grid (production startup pattern;
        # a cold bucket pays seconds of jit inline otherwise) --------------
        t0 = time.time()
        srv.warmup_buckets(batch_sizes=(1,))
        print(f"B=1 bucket-grid warmup ({srv.compiled_shapes} shapes): "
              f"{time.time()-t0:.1f}s", flush=True)

        # ---- single-molecule latency (the serving SLO number) ------------
        lats = []
        for i in range(args.requests):
            smi = SMILES[i % len(SMILES)]
            t0 = time.time()
            srv.predict(smi)
            lats.append((time.time() - t0) * 1e3)
        lats.sort()
        p50 = lats[len(lats) // 2]
        p95 = lats[int(len(lats) * 0.95)]
        print(f"B=1 latency over {args.requests} requests: "
              f"p50={p50:.1f}ms p95={p95:.1f}ms", flush=True)

        # ---- batched throughput (end-to-end incl. host featurization) ----
        batch = [SMILES[i % len(SMILES)] for i in range(args.batch)]
        t0 = time.time()
        srv.predict(batch)  # compiles the B=64 bucket
        print(f"B={args.batch} first call (compile): {time.time()-t0:.1f}s", flush=True)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            srv.predict(batch)
        dt = (time.time() - t0) / reps
        print(f"B={args.batch} end-to-end: {dt*1e3:.1f}ms/request = "
              f"{args.batch/dt:.0f} mols/s (incl. featurization)", flush=True)

        result = {
            "b1_p50_ms": round(p50, 1), "b1_p95_ms": round(p95, 1),
            "b64_ms": round(dt * 1e3, 1),
            "b64_mols_per_s": round(args.batch / dt),
            "compiled_shapes": srv.compiled_shapes,
        }

        # ---- sustained load, UNIQUE molecules: serial predict() loop vs
        # concurrent clients through the pipelined DynamicBatcher.  Unique
        # SMILES defeat the featurization cache, so the host featurize cost
        # is real per batch — the pipeline's win is overlapping it with the
        # previous batch's device pull. ---------------------------------
        import threading as _th

        from mmdti_tpu.api.serve_api import DynamicBatcher

        # double-ether ladders C{a}OC{b}OC{c} with a+b+c fixed: every string
        # is globally unique across the probe (no featurization-cache hits)
        # while every molecule has the same heavy-atom count — one atom
        # bucket, one smiles bucket, zero mid-measurement jit.  The chain
        # total m is sized so (m-1)(m-2)/2 compositions cover the probe's
        # 17 batches (1 warmup + 8 serial + 8 pipelined) at any --batch.
        need = 17 * args.batch
        m = 49
        while (m - 1) * (m - 2) // 2 < need:
            m += 8
        _triples = [
            (a, b, m - a - b)
            for a in range(1, m - 1) for b in range(1, m - a)
        ]
        _uid = [0]

        def unique_smiles(n):
            out = []
            for _ in range(n):
                a, b, c = _triples[_uid[0]]
                _uid[0] += 1
                out.append("C" * a + "O" + "C" * b + "O" + "C" * c)
            return out

        n_batches = 8
        # warm the atom buckets this ladder lands in (bucket jit must not
        # pollute either timed section)
        srv.predict(unique_smiles(args.batch))
        # serial: one client, one batch at a time (featurize + pull serialized)
        batches = [unique_smiles(args.batch) for _ in range(n_batches)]
        t0 = time.time()
        for b in batches:
            srv.predict(b)
        serial_s = time.time() - t0
        serial_rate = n_batches * args.batch / serial_s

        # pipelined: n_batches concurrent clients, max_batch = bucket size so
        # each client's request is its own batch flowing through the pipeline
        batches = [unique_smiles(args.batch) for _ in range(n_batches)]
        batcher = DynamicBatcher(srv, window_ms=1.0, max_batch=args.batch)
        errors = []

        def _rider(b):
            try:
                batcher.submit(b)
            except Exception as e:  # must fail the probe, not vanish
                errors.append(e)

        threads = [_th.Thread(target=_rider, args=(b,)) for b in batches]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        pipe_s = time.time() - t0
        # a failed or hung rider means the rate below would be fiction
        assert not errors, errors
        assert not any(t.is_alive() for t in threads), "rider join timed out"
        pipe_rate = n_batches * args.batch / pipe_s
        batcher.stop()
        print(
            f"sustained B={args.batch} x{n_batches} unique-SMILES: serial "
            f"{serial_rate:.0f} mols/s, pipelined {pipe_rate:.0f} mols/s "
            f"({pipe_rate / serial_rate:.2f}x)", flush=True,
        )
        result.update({
            "sustained_serial_mols_per_s": round(serial_rate),
            "sustained_pipelined_mols_per_s": round(pipe_rate),
        })

        # ---- HTTP front round trip ---------------------------------------
        if not args.skip_http:
            import threading
            import urllib.request

            http = srv.make_server(port=0)
            threading.Thread(target=http.serve_forever, daemon=True).start()
            url = f"http://127.0.0.1:{http.server_port}"
            req = urllib.request.Request(
                url + "/predict",
                data=json.dumps({"smiles": ["CCO"]}).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            t0 = time.time()
            with urllib.request.urlopen(req, timeout=300) as r:
                body = json.loads(r.read())
            http_ms = (time.time() - t0) * 1e3
            assert "predict" in body
            print(f"HTTP /predict round trip: {http_ms:.1f}ms", flush=True)
            result["http_ms"] = round(http_ms, 1)
            http.shutdown()
            http.server_close()

        print(json.dumps(result))


if __name__ == "__main__":
    main()
