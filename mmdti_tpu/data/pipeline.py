"""Async input pipeline: background collation + double-buffered device feed.

The north-star requirement (BASELINE.json): RDKit-style host featurization and
batch collation overlap with device compute.  A worker thread runs the loader
(collation + tokenization, all numpy) and a prefetcher keeps `depth` batches
already `device_put` ahead of the consumer, so the TPU never waits on the
host (the reference collates synchronously in the main process,
/root/reference/tasks/trainer.py:535-556).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_SENTINEL = object()


class AsyncLoader:
    """Wraps an iterable loader; collation runs in a background thread."""

    def __init__(self, loader: Iterable, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err = []
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone (a consumer
            that abandons the generator mid-epoch — e.g. an exception in the
            train loop — must not leave this thread blocked forever)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.loader:
                    if not _put(item):
                        return
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()


def device_prefetch(
    iterator: Iterable,
    put_fn: Callable,
    depth: int = 2,
):
    """Keep `depth` batches transferred to device ahead of the consumer.

    put_fn maps a host batch to device arrays (e.g. shard_batch over the
    mesh).  jax.device_put is async, so enqueueing here overlaps the H2D DMA
    with the device's current step.
    """
    it = iter(iterator)
    buf = []
    try:
        for _ in range(depth):
            buf.append(put_fn(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(put_fn(next(it)))
        except StopIteration:
            pass
        yield nxt


def prefetch_to_device(loader, put_fn, host_depth: int = 2, device_depth: int = 2):
    """Compose background collation with device-side double buffering."""
    return device_prefetch(AsyncLoader(loader, depth=host_depth), put_fn, depth=device_depth)
