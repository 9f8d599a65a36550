"""MolServe: low-latency online inference over a trained experiment dir.

The reference stops at batch scoring: its MolPredict
(/root/reference/predict.py:22-175) rebuilds the whole pipeline — DataHub,
Trainer, NNModel, a fresh jit — on every call, which is right for scoring a
CSV once and wrong for serving.  MolServe is the production-serving
counterpart this framework adds on top of the same artifact contract
(config.yaml + model_{fold}.ckpt + target_scaler.ss + threshold.dat):

- artifacts load ONCE; parameters stay resident on device between requests
  (device->host pulls over the thin host link are the expensive part);
- raw SMILES are featurized on the host (ConformerGen ladder + tokenizer)
  and padded onto a small set of static shape buckets, so XLA compiles one
  executable per (batch, atom, smiles) bucket and every later request with
  the same bucket reuses it — jax's own jit cache is the shape cache;
- post-processing (inverse target scaling, stored-threshold binarization,
  multiclass argmax) matches MolPredict's output contract exactly;
- an optional stdlib HTTP front (`serve()` / `make_server()`) exposes
  POST /predict and GET /health with JSON bodies; requests are serialized
  through a lock so concurrent clients share the single device cleanly.

Measured on the tunneled v5e (docs/PERF.md): ~5.9k mols/s at batch 64 with
the fused Pallas inference path.
"""

from __future__ import annotations

import os
import threading
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from mmdti_tpu.api.serve_batcher import DynamicBatcher, OverloadedError
from mmdti_tpu.chem import ConformerGen
from mmdti_tpu.chem.tokenizer import load_tokenizer
from mmdti_tpu.configs.config import load_yaml
from mmdti_tpu.data.batching import BatchCollator
from mmdti_tpu.data.scaler import TargetScaler
from mmdti_tpu.api.serve_model import (  # noqa: F401  (re-export)
    load_resident_model,
    postprocess_predictions,
)
from mmdti_tpu.utils.logger import logger

_FEATURE_KEYS = (
    "src_tokens", "src_distance", "src_edge_type", "src_coord",
    "input_ids", "attention_mask",
)

DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def _feat_nbytes(feat: Dict[str, Any]) -> int:
    """Approximate host-RAM footprint of one cached featurization dict."""
    total = 0
    for v in feat.values():
        if isinstance(v, np.ndarray):
            total += v.nbytes
        elif isinstance(v, str):
            total += len(v)
    return total


class MolServe:
    """Load a trained experiment dir once; answer SMILES->prediction requests.

    Parameters
    ----------
    load_model:      experiment dir written by MolTrain.fit (config.yaml,
                     model_0.ckpt / model_0.orbax, target_scaler.ss, ...).
    use_pallas:      'auto' (fused kernels on TPU, XLA elsewhere) | bool.
    batch_buckets:   static batch sizes requests are padded onto; larger
                     requests are chunked at the largest bucket.
    num_workers:     host featurization threads (0 = inline).
    feature_cache:   LRU entry bound for per-SMILES featurization results
                     (0 = off).  Featurization is deterministic per SMILES
                     (fixed seed) and dominates end-to-end request cost
                     (measured: 172.7ms of a B=64 request vs 10.8ms device
                     time), so repeated molecules skip conformer generation.
    feature_cache_bytes: host-RAM bound on the same cache (default 256MB) —
                     a large-molecule entry holds O(N^2) distance/edge arrays
                     (~0.5MB at max_atoms=256), so the entry bound alone
                     could grow to gigabytes.
    device_pair_feats: 'auto' (device on TPU) | bool.  'device' ships only
                     tokens + [B,N,3] coords per request and reconstructs
                     the [B,N,N] distance/edge arrays inside the jit
                     (ops/pair_feats.py) — the dense pair arrays dominate
                     the request's host->device transfer otherwise.
    serve_folds:     1 (default): serve fold 0 — the single-model latency
                     contract.  K or 'all': serve the first K (or all) fold
                     checkpoints of a CV experiment as an on-device
                     ensemble — fold params are stacked leaf-wise and the
                     forward is vmapped over the fold axis, so one dispatch
                     returns the MolPredict-identical fold-mean (activated
                     outputs averaged; K x the device FLOPs and K x the
                     resident param HBM).
    mesh_shape:      optional (data, model) device-mesh shape for scale-out
                     serving.  Request batches shard over 'data' (DP); with
                     model>1 the TP_RULES kernels shard over 'model' exactly
                     as in training.  Batch buckets quantize up to multiples
                     of the data axis.  None (default) = single device.
    """

    def __init__(
        self,
        load_model: str,
        use_pallas: Union[str, bool] = "auto",
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        num_workers: int = 0,
        feature_cache: int = 4096,
        feature_cache_bytes: int = 256 << 20,
        device_pair_feats: Union[str, bool] = "auto",
        serve_folds: Union[str, int] = 1,
        mesh_shape: Optional[Sequence[int]] = None,
    ):
        if not load_model or not os.path.isdir(load_model):
            raise ValueError(f"load_model must be an experiment dir, got {load_model!r}")
        self.load_model = load_model
        self.config = load_yaml(os.path.join(load_model, "config.yaml"))
        self.task = self.config.task
        self.target_cols = str(self.config.target_cols).split(",")
        self.batch_buckets = tuple(sorted(int(b) for b in batch_buckets))
        if not self.batch_buckets:
            raise ValueError("batch_buckets must be non-empty")

        # --- optional device mesh (scale-out serving) ----------------------
        # mesh_shape=(data, model) serves one resident model over several
        # chips: request batches shard over the 'data' axis (pure DP) and,
        # with model>1, the TP_RULES kernels shard over 'model' exactly as in
        # training (parallel/mesh.py) — jit propagates the input shardings,
        # so the forward code is unchanged and XLA inserts the collectives.
        self.mesh = None
        if mesh_shape is not None:
            from mmdti_tpu.parallel.mesh import DATA_AXIS, make_mesh

            self.mesh = make_mesh(tuple(int(x) for x in mesh_shape))
            dp = int(self.mesh.shape[DATA_AXIS])
            if dp > 1:
                # batch-dim sharding needs buckets divisible by the data
                # axis; quantize UP so every request still fits one bucket
                self.batch_buckets = tuple(
                    sorted({max(dp, -(-b // dp) * dp) for b in self.batch_buckets})
                )
        # fused Pallas kernels shard over this mesh via shard_map (None
        # clears a mesh a previously-built Trainer may have registered)
        from mmdti_tpu.parallel.mesh import set_kernel_mesh

        set_kernel_mesh(self.mesh)

        cfg = dict(self.config)

        # --- host featurization ------------------------------------------
        # 'auto': ship [B,N,3] coords and reconstruct the [B,N,N] pair arrays
        # on device (ops/pair_feats.py) whenever the backend is TPU — the
        # dense pair arrays dominate the request's host->device transfer,
        # and skipping them on host shrinks featurization + cache entries
        from mmdti_tpu.ops.pair_feats import resolve_pair_feats_mode

        pair_mode = resolve_pair_feats_mode(device_pair_feats)
        self.tokenizer = load_tokenizer(cfg.get("chemberta_dir", "") or None)
        self.conformer = ConformerGen(**{
            **cfg, "num_workers": num_workers,
            "pair_feats": pair_mode == "host",
        })
        # ConformerGen resolves the atom dictionary exactly the way NNModel
        # does (unimol_dir -> mol.dict.txt, + [MASK]); share it instead of
        # re-deriving the lookup rule here
        self.dictionary = self.conformer.dictionary
        self.collator = BatchCollator(
            self.tokenizer, pad_idx=self.dictionary.pad(), pad_mode="bucket",
            pair_feats=pair_mode,
        )

        # --- artifacts -----------------------------------------------------
        self.scaler = (
            TargetScaler(cfg.get("target_normalize", "none"), self.task, load_model)
            if cfg.get("use_scaler", True)
            else None
        )
        self.threshold: Union[float, np.ndarray] = 0.5
        thr_path = os.path.join(load_model, "threshold.dat")
        if os.path.exists(thr_path):
            self.threshold = joblib.load(thr_path)

        # --- model + resident params (api/serve_model.py) -------------------
        rm = load_resident_model(
            load_model, cfg, self.task, self.dictionary, self.tokenizer,
            self.mesh, use_pallas=use_pallas, serve_folds=serve_folds,
        )
        self.model = rm.model
        self.params = rm.params
        self.output_dim = rm.output_dim
        self.activation_fn = rm.activation_fn
        self.serve_folds = rm.serve_folds
        use_pallas = rm.use_pallas
        self._forward = rm.forward
        self._embed = rm.embed
        self._shapes_seen: set = set()
        self._lock = threading.Lock()
        self._feat_cache: "OrderedDict[str, Dict[str, Any]]" = OrderedDict()
        self._feat_cache_size = int(feature_cache)
        self._feat_cache_byte_cap = int(feature_cache_bytes)
        self._feat_cache_bytes = 0
        self.cache_hits = 0
        # rolling request-latency window (seconds) for /health percentiles;
        # deque bound keeps the stats O(1) memory under sustained load
        from collections import deque

        self._latencies: "deque[float]" = deque(maxlen=1024)
        self._lat_lock = threading.Lock()
        logger.info(
            "MolServe ready: task=%s output_dim=%d pallas=%s backend=%s",
            self.task, self.output_dim, use_pallas, jax.default_backend(),
        )

    # ------------------------------------------------------------------
    def _featurize(self, smiles: List[str]) -> List[Dict[str, Any]]:
        cache = self._feat_cache
        if not self._feat_cache_size:
            feats = self.conformer.transform(smiles)
            for f, s in zip(feats, smiles):
                f["smile"] = s
            return feats
        # LRU: only the misses (first occurrence per unique string) run the
        # conformer ladder; cached dicts are shared read-only (the collator
        # copies into padded batch arrays and never mutates samples).
        resolved: Dict[str, Dict[str, Any]] = {}
        misses = []
        seen_miss = set()
        for s in smiles:
            if s in resolved or s in seen_miss:
                continue
            if s in cache:
                cache.move_to_end(s)
                resolved[s] = cache[s]
                self.cache_hits += 1
            else:
                seen_miss.add(s)
                misses.append(s)
        if misses:
            new_feats = self.conformer.transform(misses)
            for f, s in zip(new_feats, misses):
                f["smile"] = s
                resolved[s] = f
                cache[s] = f
                self._feat_cache_bytes += _feat_nbytes(f)
            while cache and (
                len(cache) > self._feat_cache_size
                or self._feat_cache_bytes > self._feat_cache_byte_cap
            ):
                _, evicted = cache.popitem(last=False)
                self._feat_cache_bytes -= _feat_nbytes(evicted)
        return [resolved[s] for s in smiles]

    def _device_feats(self, feats_chunk: List[Dict[str, Any]]):
        """Collate one chunk onto bucketed static shapes and ship to device."""
        n = len(feats_chunk)
        bucket = next(b for b in self.batch_buckets if b >= n)
        padded = feats_chunk + [feats_chunk[-1]] * (bucket - n)
        zero = np.zeros(max(1, self.output_dim), dtype=np.float32)
        batch, _ = self.collator([(f, zero) for f in padded])
        dev = self._place_feats(
            {k: batch[k] for k in _FEATURE_KEYS if k in batch}
        )
        self._shapes_seen.add(
            (bucket, batch["src_tokens"].shape[1], batch["input_ids"].shape[1])
        )
        return dev, n

    def _place_feats(self, feats: Dict[str, Any]) -> Dict[str, Any]:
        """Ship a collated feature dict to device: one tree device_put with
        the batch dim sharded over the mesh's 'data' axis when serving on a
        mesh, a plain single-device transfer otherwise."""
        if self.mesh is not None:
            from mmdti_tpu.parallel.mesh import batch_sharding

            return jax.device_put(
                {k: np.asarray(v) for k, v in feats.items()},
                batch_sharding(self.mesh),
            )
        return {k: jnp.asarray(v) for k, v in feats.items()}

    # --- staged execution: dispatch (host work) / pull (device sync) ------
    # jax dispatch is asynchronous, so the dispatch stage returns un-pulled
    # device arrays almost immediately after the host featurize+collate.
    # Splitting the two lets a pipeline (predict() itself, and
    # DynamicBatcher's completion thread) featurize request k+1 while the
    # device still crunches request k — host featurization and device time
    # then overlap instead of adding up.
    def _dispatch_batched(self, feats: List[Dict[str, Any]], fn):
        """Collate chunks (at most the largest batch bucket each) and
        async-dispatch fn over them; returns [(device_out, n_valid), ...]
        still in flight on device."""
        # a new (batch, atom, smiles) bucket traces fn here: (re-)register
        # this server's mesh so the fused kernels shard over it (and so a
        # Trainer's mesh registered since __init__ can't leak in)
        from mmdti_tpu.parallel.mesh import set_kernel_mesh

        set_kernel_mesh(self.mesh)
        max_chunk = self.batch_buckets[-1]
        chunks = []
        for i in range(0, len(feats), max_chunk):
            dev, n = self._device_feats(feats[i : i + max_chunk])
            chunks.append((fn(self.params, dev), n))
        return chunks

    @staticmethod
    def _pull_batched(chunks):
        """Block on the dispatched chunks and concatenate the valid rows."""
        outs = [jax.tree.map(lambda x: np.asarray(x)[:n], out)
                for out, n in chunks]
        if isinstance(outs[0], tuple):
            return tuple(np.concatenate(parts, axis=0) for parts in zip(*outs))
        return np.concatenate(outs, axis=0)

    def _run_batched(self, feats: List[Dict[str, Any]], fn):
        return self._pull_batched(self._dispatch_batched(feats, fn))

    def _dispatch_forward(self, smiles: List[str]):
        """Featurize + collate + async-dispatch under the serialization lock;
        returns (chunks, feats)."""
        with self._lock:
            feats = self._featurize(smiles)
            chunks = self._dispatch_batched(feats, self._forward)
        return chunks, feats

    def _finalize_forward(self, chunks, feats: List[Dict[str, Any]],
                          t0: float) -> Dict[str, Any]:
        """Pull the dispatched chunks, postprocess, record latency.  Runs
        outside the lock — the pull only reads device outputs."""
        raw = self._pull_batched(chunks)
        with self._lat_lock:
            self._latencies.append(time.perf_counter() - t0)
        out = postprocess_predictions(
            self.task, raw, self.scaler, self.threshold,
            self.config.get("multiclass_cnt"),
        )
        out["target_cols"] = self.target_cols
        # a molecule that fell through the conformer ladder to zero
        # coordinates still gets a prediction (batch-scoring parity) but is
        # flagged so callers can discard it
        out["valid"] = np.array(
            [not (np.asarray(f["src_coord"]) == 0.0).all() for f in feats]
        )
        return out

    # ------------------------------------------------------------------
    def predict(self, smiles: Union[str, Sequence[str]]) -> Dict[str, Any]:
        """SMILES (one or a list) -> {"predict", "proba", "target_cols",
        "valid"}.

        Unembeddable SMILES follow the featurizer's documented fallback
        ladder (3D -> 2D -> zero coordinates) rather than erroring, mirroring
        batch scoring — they come back with valid=False; unparseable SMILES
        raise.
        """
        smi_list = [smiles] if isinstance(smiles, str) else list(smiles)
        if not smi_list:
            raise ValueError("empty SMILES request")
        t0 = time.perf_counter()
        # dispatch holds the lock (host featurize + collate); the device
        # pull happens outside it, so a concurrent request's host stage
        # overlaps this one's device time.  (The latency deque has its own
        # lock: /health must not block behind an in-flight predict, and
        # latency_stats() iterating the deque during a concurrent append
        # raises in CPython.)
        chunks, feats = self._dispatch_forward(smi_list)
        return self._finalize_forward(chunks, feats, t0)

    def embed(self, smiles: Union[str, Sequence[str]]):
        """SMILES -> (cls_repr, pooled_repr) feature matrices (the serving
        analog of MolPredict(extract_feature=True))."""
        smi_list = [smiles] if isinstance(smiles, str) else list(smiles)
        with self._lock:
            feats = self._featurize(smi_list)
            cls_r, pooled = self._run_batched(feats, self._embed)
        return cls_r, pooled

    def warmup(self, batch_sizes: Sequence[int] = (1,), smiles: str = "CCO"):
        """Pre-compile the forward for the given batch buckets so the first
        real request doesn't pay the jit."""
        for b in batch_sizes:
            self.predict([smiles] * int(b))
        return self

    def warmup_buckets(
        self,
        batch_sizes: Sequence[int] = (1,),
        atom_buckets: Optional[Sequence[int]] = None,
        smiles_buckets: Optional[Sequence[int]] = None,
    ):
        """Pre-compile the forward for a GRID of shape buckets.

        A request whose molecules land in a not-yet-compiled (batch, atom,
        smiles) bucket pays the jit inline (measured: seconds of p95 through
        the tunnel, scripts/serve_probe.py) — production startup should
        compile the expected bucket grid up front.  Synthesizes dummy device
        inputs directly, so no SMILES of a particular size are needed.
        """
        from mmdti_tpu.parallel.mesh import set_kernel_mesh

        set_kernel_mesh(self.mesh)  # warmup traces: shard kernels over our mesh
        atom_buckets = tuple(atom_buckets or self.collator.atom_buckets[:3])
        smiles_buckets = tuple(smiles_buckets or self.collator.smiles_buckets[:3])
        pad = self.dictionary.pad()
        for b in batch_sizes:
            # clamp like predict(), which chunks at the largest bucket
            bucket = next(
                (x for x in self.batch_buckets if x >= int(b)),
                self.batch_buckets[-1],
            )
            for na in atom_buckets:
                for ns in smiles_buckets:
                    tok = np.full((bucket, na), pad, np.int32)
                    tok[:, 0] = self.dictionary.bos()  # >=1 valid atom: no 0-div pooling
                    feats = {
                        "src_tokens": tok,
                        "input_ids": np.ones((bucket, ns), np.int32),
                        "attention_mask": np.ones((bucket, ns), np.int32),
                    }
                    # match the exact feature-dict structure real requests
                    # ship — a different key set would compile a different
                    # jit signature and the warmup would buy nothing
                    if self.collator.pair_feats == "device":
                        feats["src_coord"] = np.zeros((bucket, na, 3), np.float32)
                    else:
                        feats["src_distance"] = np.zeros((bucket, na, na), np.float32)
                        feats["src_edge_type"] = np.full((bucket, na, na), pad, np.int32)
                    feats = self._place_feats(feats)
                    np.asarray(self._forward(self.params, feats))  # sync = compiled
                    self._shapes_seen.add((bucket, na, ns))
        return self

    @property
    def compiled_shapes(self) -> int:
        return len(self._shapes_seen)

    def latency_stats(self) -> Dict[str, Any]:
        """Rolling p50/p95 over the last 1024 predict() calls (ms)."""
        with self._lat_lock:  # snapshot vs concurrent predict() appends
            lats = list(self._latencies)
        if not lats:
            return {"count": 0, "p50_ms": None, "p95_ms": None}
        return {
            "count": len(lats),
            "p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 2),
            "p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 2),
        }

    # ------------------------------------------------------------------
    def make_server(
        self, host: str = "127.0.0.1", port: int = 8000,
        dynamic_batch_window_ms: float = 0.0,
    ) -> "ThreadingHTTPServer":
        """Build (without starting) the HTTP front (api/serve_http.py).

        POST /predict  {"smiles": ["CCO", ...]}  ->
            {"predict": [[...]], "proba": [[...]]|null, "target_cols": [...]}
        POST /embed    {"smiles": [...]} -> {"cls_repr": ..., "pooled": ...}
        GET  /health   -> {"status": "ok", "task": ..., "compiled_shapes": N}

        dynamic_batch_window_ms > 0 coalesces concurrent /predict requests
        into shared device batches (DynamicBatcher).
        """
        from mmdti_tpu.api.serve_http import make_server

        return make_server(self, host, port, dynamic_batch_window_ms)

    def serve(self, host: str = "127.0.0.1", port: int = 8000,
              dynamic_batch_window_ms: float = 0.0):
        """Blocking HTTP serving loop."""
        server = self.make_server(host, port, dynamic_batch_window_ms)
        logger.info("MolServe listening on http://%s:%d", host, server.server_port)
        try:
            server.serve_forever()
        finally:
            server.server_close()


if __name__ == "__main__":  # CLI kept here for compat: docs/API.md
    from mmdti_tpu.api.serve_http import main

    main()
