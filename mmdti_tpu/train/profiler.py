"""Tracing / profiling hooks (SURVEY §5).

The reference has only tqdm timing; here we expose jax.profiler-based tracing
(xprof-compatible traces viewable in TensorBoard/Perfetto) plus lightweight
step timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from mmdti_tpu.utils.logger import logger


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an xprof device trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


class StepTimer:
    """Per-step wall-clock stats with correct device-sync boundaries."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


def enable_nan_debugging() -> None:
    """Flip on jax nan-checking (SURVEY §5 'race detection / sanitizers' row:
    functional purity + NaN checks are the TPU-side equivalent)."""
    jax.config.update("jax_debug_nans", True)
    logger.info("jax_debug_nans enabled")


class DispatchProfiler:
    """Fit-loop profiling hooks: xprof-trace the first ``profile_steps``
    dispatches of the first epoch into ``profile_dir``, plus per-epoch
    dispatch-time p50/p95 logging.  Every method is a no-op when
    ``profile_dir`` is falsy — the StepTimer's block_until_ready sync would
    otherwise serialize async dispatch (SURVEY §5)."""

    def __init__(self, profile_dir, profile_steps: int):
        self.dir = profile_dir
        self.steps = int(profile_steps)
        self.enabled = bool(profile_dir)
        self.active = False
        self.dispatches = 0
        self.timer = StepTimer() if self.enabled else None

    def begin(self, first_epoch: bool) -> None:
        if not self.enabled:
            return
        if first_epoch and self.dispatches == 0:
            jax.profiler.start_trace(self.dir)
            self.active = True
        self.timer.start()

    def end(self, result) -> None:
        if not self.enabled:
            return
        self.timer.stop(result)
        self.dispatches += 1
        if self.active and self.dispatches >= self.steps:
            jax.profiler.stop_trace()
            self.active = False
            logger.info("Profiler trace written to %s", self.dir)

    def epoch_summary(self, epoch: int) -> None:
        if self.enabled and self.timer.times:
            s = self.timer.summary()
            logger.info(
                "Epoch %d dispatch timing: p50=%.1fms p95=%.1fms over %d dispatches",
                epoch + 1, s["p50_s"] * 1e3, s["p95_s"] * 1e3, s["steps"],
            )
            self.timer = StepTimer()

    def close(self) -> None:
        """Stop a still-open trace (fewer total dispatches than profile_steps)."""
        if self.active:
            jax.profiler.stop_trace()
            logger.info("Profiler trace written to %s", self.dir)
