"""Dynamic request batching for MolServe (split out of serve_api.py).

Coalesces concurrent predict requests into shared device batches and
pipelines the host stage (featurize + collate + async dispatch) against the
device pull across consecutive batches.  The reference has no serving layer
at all (SURVEY §0); this is new TPU-serving capability.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Dict, List, Optional

from mmdti_tpu.utils.logger import logger  # noqa: F401  (kept for parity/debug)


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

    Two threads form a pipeline over MolServe's staged forward (plus a
    retry worker that resolves failed batches per rider off both, so slow
    sequential retries never block healthy traffic):

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

    def __init__(self, serve, window_ms: float = 5.0,
                 max_batch: Optional[int] = None, pipeline_depth: int = 2,
                 max_pending: int = 1024):
        self.serve = serve
        self.window = float(window_ms) / 1e3
        self.max_batch = int(max_batch or serve.batch_buckets[-1])
        self.max_pending = int(max_pending)
        self._q: queue.Queue = queue.Queue()
        self._cq: queue.Queue = queue.Queue(maxsize=max(1, int(pipeline_depth)))
        # failed-batch riders retry on their own worker so their sequential
        # full predicts (featurize + dispatch + blocking pull each) never
        # head-of-line block the completion thread's pulls of healthy
        # batches, nor back-pressure the dispatch loop through _cq
        self._rq: queue.Queue = queue.Queue()
        self.batches_run = 0
        self.requests_served = 0
        self._stats_lock = threading.Lock()
        # total in-flight riders (admitted minus resolved) — the shed gate.
        # _q.qsize() alone undercounts: riders parked in the completion or
        # retry queues still block HTTP threads, so under a persistently
        # failing featurizer blocked threads could grow past max_pending
        # while submit kept admitting (ADVICE r4).
        self._inflight = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="mmdti-batcher-dispatch")
        self._cthread = threading.Thread(
            target=self._completion_loop, daemon=True,
            name="mmdti-batcher-complete")
        self._rthread = threading.Thread(
            target=self._retry_loop, daemon=True, name="mmdti-batcher-retry")
        self._thread.start()
        self._cthread.start()
        self._rthread.start()

    def stop(self):
        """Stop the pipeline + retry threads (idempotent)."""
        self._q.put(self._STOP)

    @property
    def _alive(self) -> bool:
        return (self._thread.is_alive() and self._cthread.is_alive()
                and self._rthread.is_alive())

    def submit(self, smiles: List[str]) -> Dict[str, Any]:
        """Blocking: returns this request's rows of the coalesced batch.

        Raises OverloadedError when more than ``max_pending`` riders are
        already queued — each queued rider blocks an HTTP thread, so
        shedding load here bounds both memory and thread count under a
        burst (the HTTP front maps it to 429).
        """
        if not smiles:  # reject here — must not fail a whole shared batch
            raise ValueError("empty SMILES request")
        with self._stats_lock:
            if self._inflight >= self.max_pending:
                raise OverloadedError(
                    f"{self._inflight} requests already in flight "
                    f"(max_pending={self.max_pending})"
                )
            self._inflight += 1
        done = threading.Event()
        holder: Dict[str, Any] = {}
        self._q.put((list(smiles), done, holder))
        # liveness guard: if either pipeline thread is gone (stop() or a
        # fatal error), fail loudly instead of blocking this client forever
        while not done.wait(timeout=1.0):
            if not self._alive:
                with self._stats_lock:  # release the shed-gate slot
                    self._inflight -= 1
                raise RuntimeError("DynamicBatcher is not running")
        if "error" in holder:
            raise holder["error"]
        return holder["out"]

    def _resolve(self, done):
        """Mark one rider resolved: release its in-flight slot, then wake it."""
        with self._stats_lock:
            self._inflight -= 1
        done.set()

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
            self._resolve(done)

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
            self._resolve(done)

    def _loop(self):
        """Dispatch loop: gather riders, run the host stage, hand off."""
        while True:
            first = self._q.get()
            if first is self._STOP:
                self._cq.put(self._STOP)  # completion drains, then exits
                self._rq.put(self._STOP)  # retry worker too
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
                # host-stage failure (featurizer): hand the batch to the
                # retry worker (via the completion thread, preserving batch
                # ordering of the stats) — per-rider retries include
                # blocking device pulls, and running them here would stall
                # the dispatch loop
                self._cq.put((pending, None, None, t0))
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
            if chunks is None:  # host-stage failure: per-rider isolation
                self._rq.put(pending)
                continue
            try:
                out = self.serve._finalize_forward(chunks, feats, t0)
                self._distribute(pending, out)
            except Exception:
                self._rq.put(pending)  # device-stage failure: same isolation

    def _retry_loop(self):
        """Retry worker: failed batches resolve per rider here, off both
        pipeline threads (retries are slow sequential predicts)."""
        while True:
            pending = self._rq.get()
            if pending is self._STOP:
                return
            try:
                self._retry_each_alone(pending)
            except Exception as e:  # belt-and-braces: never die mid-loop
                for _, done, holder in pending:
                    if not done.is_set():
                        holder["error"] = e
                        self._resolve(done)
