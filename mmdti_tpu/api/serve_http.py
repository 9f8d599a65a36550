"""HTTP front + CLI for MolServe (split out of serve_api.py).

A stdlib ThreadingHTTPServer exposing the serving endpoints:

POST /predict  {"smiles": ["CCO", ...]}  ->
    {"predict": [[...]], "proba": [[...]]|null, "target_cols": [...],
     "valid": [...]}
POST /embed    {"smiles": [...]} -> {"cls_repr": ..., "pooled": ...}
GET  /health   -> status, artifact metadata, latency/batcher stats

The reference has no serving layer at all (SURVEY §0); this is new
TPU-serving capability.  Behavior notes: request bodies are JSON, capped at
32MB; featurizer failures 500 only the offending request (DynamicBatcher
isolates co-batched riders); queue overflow maps to 429 so clients back off.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from mmdti_tpu.api.serve_batcher import DynamicBatcher, OverloadedError
from mmdti_tpu.utils.logger import logger


def make_server(serve, host: str = "127.0.0.1", port: int = 8000,
                dynamic_batch_window_ms: float = 0.0) -> ThreadingHTTPServer:
    """Build (without starting) the HTTP front over a MolServe instance."""
    batcher = (
        DynamicBatcher(serve, window_ms=dynamic_batch_window_ms)
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


def main(argv: Optional[List[str]] = None):
    import argparse

    from mmdti_tpu.api.serve_api import MolServe

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
