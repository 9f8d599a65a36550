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

import json
import os
import queue
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import joblib
import numpy as np

from mmdti_tpu.chem import ConformerGen
from mmdti_tpu.chem.tokenizer import load_tokenizer
from mmdti_tpu.configs.config import load_yaml
from mmdti_tpu.data.batching import BatchCollator
from mmdti_tpu.data.scaler import TargetScaler
from mmdti_tpu.losses.registry import ACTIVATION_REGISTRY, resolve_output_dim
from mmdti_tpu.models.mm_model import build_model
from mmdti_tpu.train.trainer import load_checkpoint
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


def postprocess_predictions(
    task: str,
    raw: np.ndarray,
    scaler: Optional[TargetScaler] = None,
    threshold: Union[float, np.ndarray] = 0.5,
    multiclass_cnt: Optional[int] = None,
) -> Dict[str, Any]:
    """Map activated model outputs to MolPredict's output contract
    (/root/reference/predict.py:63-87): regression outputs are
    inverse-scaled, classification probabilities are binarized with the
    stored threshold, multiclass takes the argmax over the class axis.

    Returns {"predict": ndarray, "proba": ndarray | None}.
    """
    raw = np.asarray(raw)
    if task == "multiclass":
        if multiclass_cnt is not None and raw.shape[-1] != multiclass_cnt:
            raise ValueError(
                f"multiclass output width {raw.shape[-1]} != multiclass_cnt {multiclass_cnt}"
            )
        return {"predict": np.argmax(raw, axis=-1).reshape(-1, 1), "proba": raw}
    if task in ("classification", "multilabel_classification"):
        return {"predict": (raw > threshold).astype(np.int64), "proba": raw}
    if scaler is not None and scaler.scaler is not None:
        raw = scaler.inverse_transform(raw)
    return {"predict": raw, "proba": None}


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

        # --- model + resident params ---------------------------------------
        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        use_pallas = bool(use_pallas)
        unimol_overrides = dict(cfg.get("unimol_overrides") or {})
        unimol_overrides.setdefault(
            "pair_dtype", "bfloat16" if use_pallas else "float32"
        )
        self.output_dim = resolve_output_dim(
            self.task, cfg.get("num_classes"), cfg.get("multiclass_cnt")
        )
        self.activation_fn = ACTIVATION_REGISTRY[self.task]
        self.model = build_model(
            output_dim=self.output_dim,
            atom_vocab_size=len(self.dictionary),
            atom_pad_idx=self.dictionary.pad(),
            task=self.task,
            smiles_vocab_size=getattr(self.tokenizer, "vocab_size", 600),
            use_fds=bool(cfg.get("fds", False)),
            fds_num=int(cfg.get("fds_num", 20) or 20),
            compute_dtype=cfg.get("compute_dtype", "bfloat16"),
            use_pallas=use_pallas,
            unimol_overrides=unimol_overrides,
            chemberta_overrides=self._chemberta_overrides(cfg) or None,
            crossmodal_overrides=dict(cfg["crossmodal_overrides"])
            if cfg.get("crossmodal_overrides")
            else None,
        )
        model_folds = int(cfg.get("model_folds", 1) or 1)
        k = model_folds if serve_folds == "all" else int(serve_folds)
        if k < 1 or k > model_folds:
            raise ValueError(
                f"serve_folds={serve_folds!r} but the experiment dir has "
                f"{model_folds} fold checkpoint(s)"
            )
        self.serve_folds = k
        if model_folds > 1 and k == 1:
            # CV experiment dirs hold K fold checkpoints; the default keeps
            # the single-model latency contract and uses fold 0
            logger.info(
                "experiment dir has %s fold checkpoints; serving fold 0 "
                "(pass serve_folds='all' for the on-device ensemble, or use "
                "MolPredict for fold-averaged batch scoring)",
                model_folds,
            )
        if k == 1:
            params = load_checkpoint(load_model, 0)["params"]
            if self.mesh is not None:
                from mmdti_tpu.parallel.mesh import param_sharding

                # TP_RULES over 'model' (replication with model-dim 1) —
                # the same placement Trainer._place_params uses in training
                self.params = jax.device_put(
                    params, param_sharding(self.mesh, params)
                )
            else:
                self.params = jax.device_put(params)
        else:
            from mmdti_tpu.parallel.mesh import MODEL_AXIS

            if self.mesh is not None and int(self.mesh.shape[MODEL_AXIS]) > 1:
                # the fold axis shifts every kernel to rank 3, so the rank-2
                # TP_RULES specs would shard the wrong dim — refuse loudly
                raise ValueError(
                    "serve_folds>1 with a tensor-parallel mesh (model axis > 1) "
                    "is unsupported; use a pure-DP mesh_shape=(n, 1)"
                )
            # leaf-wise stack on host, ONE device_put: params gain a leading
            # [k] fold axis the vmapped forward maps over
            trees = [load_checkpoint(load_model, f)["params"] for f in range(k)]
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *trees)
            if self.mesh is not None:
                from mmdti_tpu.parallel.mesh import replicate

                self.params = replicate(self.mesh, stacked)
            else:
                self.params = jax.device_put(stacked)
            logger.info("serving a %d-fold on-device ensemble", k)

        model, activation = self.model, self.activation_fn

        # Params are ARGUMENTS, never closure constants: closing over them
        # embeds 74M weights in the HLO and blows the remote-compile request
        # limit (HTTP 413, docs/PERF.md).
        if k == 1:
            @jax.jit
            def _forward(params, feats):
                out = model.apply({"params": params}, **feats, deterministic=True)
                return activation(out["logits"])

            @jax.jit
            def _embed(params, feats):
                out = model.apply({"params": params}, **feats, deterministic=True)
                return out["cls_repr"], out["pooled"]
        else:
            @jax.jit
            def _forward(params, feats):
                def one_fold(p):
                    out = model.apply({"params": p}, **feats, deterministic=True)
                    return activation(out["logits"])

                # MolPredict's ensemble algebra exactly: mean of ACTIVATED
                # outputs over folds (train/nnmodel.py::evaluate); the
                # inverse target transform happens once, downstream
                return jnp.mean(jax.vmap(one_fold)(params), axis=0)

            @jax.jit
            def _embed(params, feats):
                # representations are per-model quantities, not ensemble
                # means — extract from fold 0 (a lazy in-jit slice)
                p0 = jax.tree.map(lambda x: x[0], params)
                out = model.apply({"params": p0}, **feats, deterministic=True)
                return out["cls_repr"], out["pooled"]

        self._forward = _forward
        self._embed = _embed
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

    @staticmethod
    def _chemberta_overrides(cfg: Dict[str, Any]) -> Dict[str, Any]:
        """Same dims as training: HF config.json fields (when chemberta_dir
        is set) under the explicit overrides — mirrors NNModel's merge so
        the checkpoint restores onto an identical param tree."""
        overrides = dict(cfg.get("chemberta_overrides") or {})
        cb_dir = cfg.get("chemberta_dir", "") or ""
        if cb_dir and os.path.isdir(cb_dir):
            from mmdti_tpu.models.convert import hf_chemberta_overrides

            overrides = {**hf_chemberta_overrides(cb_dir), **overrides}
        return overrides

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
    ) -> ThreadingHTTPServer:
        """Build (without starting) the HTTP front.

        POST /predict  {"smiles": ["CCO", ...]}  ->
            {"predict": [[...]], "proba": [[...]]|null, "target_cols": [...]}
        POST /embed    {"smiles": [...]} -> {"cls_repr": ..., "pooled": ...}
        GET  /health   -> {"status": "ok", "task": ..., "compiled_shapes": N}

        dynamic_batch_window_ms > 0 coalesces concurrent /predict requests
        into shared device batches (DynamicBatcher).
        """
        serve = self
        batcher = (
            DynamicBatcher(self, window_ms=dynamic_batch_window_ms)
            if dynamic_batch_window_ms > 0
            else None
        )

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, code: int, payload: Dict[str, Any]):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path.rstrip("/") in ("", "/health"):
                        body = {
                            "status": "ok",
                            "task": serve.task,
                            "target_cols": serve.target_cols,
                            "compiled_shapes": serve.compiled_shapes,
                            "feature_cache_hits": serve.cache_hits,
                            "serve_folds": serve.serve_folds,
                            "mesh": (
                                dict(serve.mesh.shape)
                                if serve.mesh is not None else None
                            ),
                            "latency": serve.latency_stats(),
                        }
                        if batcher is not None:
                            body["batcher"] = {
                                "batches_run": batcher.batches_run,
                                "requests_served": batcher.requests_served,
                                "pending": batcher._q.qsize(),
                            }
                        self._reply(200, body)
                    else:
                        self._reply(404, {"error": f"unknown path {self.path}"})
                except Exception as e:  # the liveness probe must never 500-crash
                    logger.exception("health request failed")
                    self._reply(500, {"error": str(e)})

            MAX_BODY = 32 << 20  # a 32MB JSON body is ~100k+ SMILES — reject
            # larger ones instead of buffering unbounded client input

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length > self.MAX_BODY:
                        self._reply(413, {
                            "error": f"request body {length} bytes exceeds "
                            f"the {self.MAX_BODY} byte limit",
                        })
                        return
                    req = json.loads(self.rfile.read(length) or b"{}")
                    smiles = req.get("smiles")
                    if not smiles or not isinstance(smiles, list):
                        self._reply(400, {"error": "body must be {'smiles': [...]}"})
                        return
                    if self.path.rstrip("/") == "/predict":
                        try:
                            out = (batcher.submit(smiles) if batcher
                                   else serve.predict(smiles))
                        except OverloadedError as e:
                            self._reply(429, {"error": str(e)})
                            return
                        self._reply(200, {
                            "predict": np.asarray(out["predict"]).tolist(),
                            "proba": None if out["proba"] is None
                            else np.asarray(out["proba"]).tolist(),
                            "target_cols": out["target_cols"],
                            "valid": np.asarray(out["valid"]).tolist()
                            if "valid" in out else None,
                        })
                    elif self.path.rstrip("/") == "/embed":
                        cls_r, pooled = serve.embed(smiles)
                        self._reply(200, {
                            "cls_repr": cls_r.tolist(), "pooled": pooled.tolist(),
                        })
                    else:
                        self._reply(404, {"error": f"unknown path {self.path}"})
                except Exception as e:  # serving must not die on one bad request
                    logger.exception("request failed")
                    self._reply(500, {"error": str(e)})

            def log_message(self, fmt, *args):  # route to framework logger
                logger.debug("http: " + fmt, *args)

        class _Server(ThreadingHTTPServer):
            def server_close(self):  # stop the coalescing thread with the server
                if batcher is not None:
                    batcher.stop()
                super().server_close()

        server = _Server((host, port), Handler)
        server.batcher = batcher  # introspection (tests, ops)
        return server

    def serve(self, host: str = "127.0.0.1", port: int = 8000,
              dynamic_batch_window_ms: float = 0.0):
        """Blocking HTTP serving loop."""
        server = self.make_server(host, port, dynamic_batch_window_ms)
        logger.info("MolServe listening on http://%s:%d", host, server.server_port)
        try:
            server.serve_forever()
        finally:
            server.server_close()


class OverloadedError(RuntimeError):
    """Raised by DynamicBatcher.submit when the pending queue is full;
    the HTTP front maps it to 429 so clients can back off."""


class DynamicBatcher:
    """Coalesce concurrent predict requests into single device batches,
    pipelining host and device work across consecutive batches.

    A lone request waits at most ``window_ms`` for company; whatever arrived
    by then (capped at the largest batch bucket) rides one device dispatch.
    This is the standard serving trade — a few ms of added tail latency for
    a large throughput win when many clients hit the endpoint at once, since
    a single-molecule dispatch and a bucket-64 dispatch cost nearly the same
    device time.

    Two threads form a pipeline over MolServe's staged forward:

    * the **dispatch loop** gathers riders, then runs the HOST stage
      (featurize + collate + async jax dispatch, `_dispatch_forward`) and
      hands the in-flight device handles to
    * the **completion thread**, which blocks on the device pull
      (`_finalize_forward`) and distributes rows to riders.

    While batch k's pull waits on the device, the dispatch loop is already
    featurizing batch k+1 — sustained throughput approaches
    max(host_stage, device_stage) instead of their sum.  The bounded
    hand-off queue (``pipeline_depth``) back-pressures the dispatch loop;
    dispatched-but-unpulled batches are bounded by pipeline_depth + 2 (one
    held by the completion thread mid-pull, plus one the dispatch loop
    dispatched before blocking on the full queue).
    """

    _STOP = object()

    def __init__(self, serve: "MolServe", window_ms: float = 5.0,
                 max_batch: Optional[int] = None, pipeline_depth: int = 2,
                 max_pending: int = 1024):
        self.serve = serve
        self.window = float(window_ms) / 1e3
        self.max_batch = int(max_batch or serve.batch_buckets[-1])
        self.max_pending = int(max_pending)
        self._q: queue.Queue = queue.Queue()
        self._cq: queue.Queue = queue.Queue(maxsize=max(1, int(pipeline_depth)))
        self.batches_run = 0
        self.requests_served = 0
        self._stats_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="mmdti-batcher-dispatch")
        self._cthread = threading.Thread(
            target=self._completion_loop, daemon=True,
            name="mmdti-batcher-complete")
        self._thread.start()
        self._cthread.start()

    def stop(self):
        """Stop both pipeline threads (idempotent)."""
        self._q.put(self._STOP)

    @property
    def _alive(self) -> bool:
        return self._thread.is_alive() and self._cthread.is_alive()

    def submit(self, smiles: List[str]) -> Dict[str, Any]:
        """Blocking: returns this request's rows of the coalesced batch.

        Raises OverloadedError when more than ``max_pending`` riders are
        already queued — each queued rider blocks an HTTP thread, so
        shedding load here bounds both memory and thread count under a
        burst (the HTTP front maps it to 429).
        """
        if not smiles:  # reject here — must not fail a whole shared batch
            raise ValueError("empty SMILES request")
        if self._q.qsize() >= self.max_pending:
            raise OverloadedError(
                f"{self._q.qsize()} requests already queued "
                f"(max_pending={self.max_pending})"
            )
        done = threading.Event()
        holder: Dict[str, Any] = {}
        self._q.put((list(smiles), done, holder))
        # liveness guard: if either pipeline thread is gone (stop() or a
        # fatal error), fail loudly instead of blocking this client forever
        while not done.wait(timeout=1.0):
            if not self._alive:
                raise RuntimeError("DynamicBatcher is not running")
        if "error" in holder:
            raise holder["error"]
        return holder["out"]

    def _retry_each_alone(self, pending):
        # blast-radius isolation: one rider's bad molecule (e.g. an
        # unparseable SMILES raising in the featurizer) must not 500
        # the innocent co-batched requests — retry each rider alone so
        # only the failing ones error
        for smi, done, holder in pending:
            try:
                holder["out"] = self.serve.predict(list(smi))
            except Exception as e:
                holder["error"] = e
            done.set()

    def _distribute(self, pending, out):
        row = 0
        for smi, done, holder in pending:
            n = len(smi)
            holder["out"] = {
                "predict": out["predict"][row : row + n],
                "proba": None if out["proba"] is None
                else out["proba"][row : row + n],
                "target_cols": out["target_cols"],
                "valid": out["valid"][row : row + n],
            }
            row += n
            done.set()

    def _loop(self):
        """Dispatch loop: gather riders, run the host stage, hand off."""
        while True:
            first = self._q.get()
            if first is self._STOP:
                self._cq.put(self._STOP)  # completion drains, then exits
                return
            pending = [first]
            total = len(first[0])
            deadline = time.monotonic() + self.window  # immune to clock steps
            while total < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is self._STOP:
                    self._q.put(self._STOP)  # stop after draining this batch
                    break
                pending.append(item)
                total += len(item[0])
            all_smiles = [s for smi, _, _ in pending for s in smi]
            t0 = time.perf_counter()
            try:
                chunks, feats = self.serve._dispatch_forward(all_smiles)
            except Exception:
                # host-stage failure (featurizer): resolve inline — the
                # per-rider retries are themselves host work
                self._count_batch(len(pending))
                self._retry_each_alone(pending)
                continue
            self._cq.put((pending, chunks, feats, t0))

    def _count_batch(self, n_riders: int):
        # counters bump BEFORE rider events fire: a client that saw its
        # submit() return must also see the stats reflect its batch (both
        # pipeline threads update these, hence the lock)
        with self._stats_lock:
            self.batches_run += 1
            self.requests_served += n_riders

    def _completion_loop(self):
        """Completion thread: pull device results, distribute to riders."""
        while True:
            item = self._cq.get()
            if item is self._STOP:
                return
            pending, chunks, feats, t0 = item
            self._count_batch(len(pending))
            try:
                out = self.serve._finalize_forward(chunks, feats, t0)
                self._distribute(pending, out)
            except Exception:
                try:
                    self._retry_each_alone(pending)
                except Exception as e:  # belt-and-braces: never die mid-loop
                    for _, done, holder in pending:
                        if not done.is_set():
                            holder["error"] = e
                            done.set()


def main(argv: Optional[List[str]] = None):
    import argparse

    ap = argparse.ArgumentParser(description="Serve a trained MM-DTI experiment over HTTP")
    ap.add_argument("model_dir", help="experiment dir written by MolTrain.fit")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--warmup", type=int, nargs="*", default=[1],
                    help="batch sizes to pre-compile (default: 1)")
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="coalesce concurrent requests for this many ms (0 = off)")
    ap.add_argument("--serve-folds", default="1",
                    help="1 (fold 0, default), K, or 'all': serve a CV "
                    "experiment's folds as an on-device vmapped ensemble")
    ap.add_argument("--mesh", type=int, nargs=2, default=None,
                    metavar=("DATA", "MODEL"),
                    help="serve over a (data, model) device mesh: batches "
                    "shard over DATA chips, TP kernels over MODEL")
    args = ap.parse_args(argv)
    folds = args.serve_folds if args.serve_folds == "all" else int(args.serve_folds)
    srv = MolServe(args.model_dir, serve_folds=folds, mesh_shape=args.mesh)
    if args.warmup:
        srv.warmup(args.warmup)
    srv.serve(args.host, args.port, dynamic_batch_window_ms=args.batch_window_ms)


if __name__ == "__main__":
    main()
