"""Feature Distribution Smoothing — functional, on-device.

Math twin of the reference FDS module (/root/reference/models/fds.py:31-190)
re-designed as an explicit state pytree updated inside jit: no registered
buffers, no host round-trips (the reference uploads per-epoch features from
numpy back to the GPU, tasks/trainer.py:288-306 — here the features never
leave HBM).

Semantics preserved:
  * buckets from the *raw training labels* (optionally standard-scaled and
    3-sigma cleaned) via (min, bin_width) computed once on host;
  * EMA running mean/var per bucket, momentum 0.9, factor 0 on the first
    update epoch, unbiased variance except for single-sample buckets;
  * edge-bucket clamping with the reference's "witness" rule: out-of-range
    samples join the edge bucket only when some sample lands exactly on it;
  * 1-D kernel smoothing (gaussian/triang/laplace) with reflect padding over
    the bucket axis;
  * train-time recalibration (f - mu_run) * sqrt(clip(v_smooth/v_run)) +
    mu_smooth with per-feature v_run==0 passthrough.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.signal.windows import triang

from mmdti_tpu.configs.architectures import FDSConfig


def fds_kernel_window(kernel: str = "gaussian", ks: int = 5, sigma: float = 2.0) -> np.ndarray:
    """Sum-normalized smoothing kernel (reference: fds.py:69-84)."""
    assert kernel in ("gaussian", "triang", "laplace")
    half_ks = (ks - 1) // 2
    if kernel == "gaussian":
        base = np.zeros(ks, dtype=np.float32)
        base[half_ks] = 1.0
        win = gaussian_filter1d(base, sigma=sigma)
        return (win / win.sum()).astype(np.float32)
    if kernel == "triang":
        win = triang(ks)
        return (win / win.sum()).astype(np.float32)
    xs = np.arange(-half_ks, half_ks + 1, dtype=np.float64)
    lap = np.exp(-np.abs(xs) / sigma) / (2.0 * sigma)
    return (lap / lap.sum()).astype(np.float32)


def fds_bucket_params(raw_values: np.ndarray, bucket_num: int, using_scale: bool = True) -> Tuple[float, float]:
    """(min_value, bin_width) from raw training labels
    (reference: fds.py:48-57)."""
    vals = np.asarray(raw_values, dtype=np.float64).reshape(-1)
    vals = vals[~np.isnan(vals)]
    if vals.size == 0:
        raise ValueError("FDS bucket fit: no finite training labels")
    if using_scale:
        mu, sd = vals.mean(), vals.std()
        vals = (vals - mu) / (sd if sd > 0 else 1.0)
        m, s = vals.mean(), vals.std(ddof=1) if len(vals) > 1 else 0.0
        if s > 0:
            vals = vals[(vals > m - 3 * s) & (vals < m + 3 * s)]
    value_range = vals.max() - vals.min()
    if not np.isfinite(value_range) or value_range <= 0.0:
        # constant labels: bin_width 0 would turn _bucket_assignment into
        # NaN/inf garbage indices with no error (the torch reference fails
        # loudly here with a ZeroDivisionError) — FDS over a single value
        # is meaningless, say so
        raise ValueError(
            "FDS bucket fit: training labels span zero range "
            f"({vals.min()}); feature smoothing needs varying targets"
        )
    return float(vals.min()), float(value_range / bucket_num) if bucket_num else 1.0


def init_fds_state(cfg: FDSConfig) -> Dict[str, jnp.ndarray]:
    nb = cfg.bucket_num - cfg.bucket_start
    fd = cfg.feature_dim
    return {
        "running_mean": jnp.zeros((nb, fd), jnp.float32),
        "running_var": jnp.ones((nb, fd), jnp.float32),
        "running_mean_last_epoch": jnp.zeros((nb, fd), jnp.float32),
        "running_var_last_epoch": jnp.ones((nb, fd), jnp.float32),
        "smoothed_mean_last_epoch": jnp.zeros((nb, fd), jnp.float32),
        "smoothed_var_last_epoch": jnp.ones((nb, fd), jnp.float32),
        "num_samples_tracked": jnp.zeros((nb,), jnp.float32),
        "epoch": jnp.asarray(float(cfg.start_update), jnp.float32),
    }


def _bucket_assignment(labels, min_value, bin_width, cfg: FDSConfig):
    """Effective bucket per sample + inclusion mask (witness rule)."""
    y = labels.reshape(labels.shape[0], -1)[:, 0].astype(jnp.float32)
    raw_bin = jnp.floor((y - min_value) / bin_width).astype(jnp.int32)
    lo, hi = cfg.bucket_start, cfg.bucket_num - 1
    in_range = (raw_bin >= lo) & (raw_bin <= hi)
    has_lo = jnp.any(raw_bin == lo)
    has_hi = jnp.any(raw_bin == hi)
    included = in_range | ((raw_bin < lo) & has_lo) | ((raw_bin > hi) & has_hi)
    eff = jnp.clip(raw_bin, lo, hi) - cfg.bucket_start
    return eff, included


def _calibrate(feats, m1, v1, m2, v2, clip_min=0.1, clip_max=10.0):
    """calibrate_mean_var (reference: utils/util.py:159-169), rowwise gathers."""
    total_v1 = jnp.sum(v1, axis=-1, keepdims=True)
    factor = jnp.clip(v2 / jnp.where(v1 == 0.0, 1.0, v1), clip_min, clip_max)
    calibrated = (feats - m1) * jnp.sqrt(factor) + m2
    calibrated = jnp.where(v1 == 0.0, feats, calibrated)
    return jnp.where(total_v1 < 1e-10, feats, calibrated)


def fds_smooth(
    state: Dict[str, jnp.ndarray],
    features: jnp.ndarray,   # [B, F]
    labels: jnp.ndarray,     # [B] or [B, C] scaled targets
    epoch,                   # traced scalar
    min_value: float,
    bin_width: float,
    cfg: FDSConfig,
) -> jnp.ndarray:
    eff, included = _bucket_assignment(labels, min_value, bin_width, cfg)
    m1 = state["running_mean_last_epoch"][eff]
    v1 = state["running_var_last_epoch"][eff]
    m2 = state["smoothed_mean_last_epoch"][eff]
    v2 = state["smoothed_var_last_epoch"][eff]
    f32 = features.astype(jnp.float32)
    calibrated = _calibrate(f32, m1, v1, m2, v2)
    gate = included & (epoch >= cfg.start_smooth)
    return jnp.where(gate[:, None], calibrated, f32).astype(features.dtype)


def fds_update_running_stats(
    state: Dict[str, jnp.ndarray],
    features: jnp.ndarray,   # [Ntrain, F] full-epoch features
    labels: jnp.ndarray,
    epoch,
    min_value: float,
    bin_width: float,
    cfg: FDSConfig,
) -> Dict[str, jnp.ndarray]:
    nb = cfg.bucket_num - cfg.bucket_start
    eff, included = _bucket_assignment(labels, min_value, bin_width, cfg)
    f32 = features.astype(jnp.float32)
    w = included.astype(jnp.float32)

    count = jax.ops.segment_sum(w, eff, num_segments=nb)                  # [nb]
    s1 = jax.ops.segment_sum(f32 * w[:, None], eff, num_segments=nb)     # [nb,F]
    s2 = jax.ops.segment_sum((f32 * f32) * w[:, None], eff, num_segments=nb)
    safe = jnp.maximum(count, 1.0)
    mean = s1 / safe[:, None]
    # unbiased variance; single-sample buckets get 0 (torch biased-1-sample)
    var = jnp.where(
        (count > 1.0)[:, None],
        (s2 - count[:, None] * mean * mean) / jnp.maximum(count - 1.0, 1.0)[:, None],
        0.0,
    )
    var = jnp.maximum(var, 0.0)

    present = count > 0
    tracked = state["num_samples_tracked"] + count
    if cfg.momentum is not None:
        factor = jnp.full((nb,), cfg.momentum, jnp.float32)
    else:
        factor = 1.0 - count / jnp.maximum(tracked, 1.0)
    factor = jnp.where(epoch == cfg.start_update, 0.0, factor)

    new_mean = (1.0 - factor)[:, None] * mean + factor[:, None] * state["running_mean"]
    new_var = (1.0 - factor)[:, None] * var + factor[:, None] * state["running_var"]
    out = dict(state)
    out["num_samples_tracked"] = tracked
    out["running_mean"] = jnp.where(present[:, None], new_mean, state["running_mean"])
    out["running_var"] = jnp.where(present[:, None], new_var, state["running_var"])
    return out


@partial(jax.jit, static_argnames=("cfg",))
def fds_epoch_update(
    state: Dict[str, jnp.ndarray],
    features: jnp.ndarray,   # [Ntrain, F] full-epoch features (may be sharded)
    labels: jnp.ndarray,
    epoch,
    min_value: float,
    bin_width: float,
    kernel_window,
    cfg: FDSConfig,
) -> Dict[str, jnp.ndarray]:
    """Per-epoch FDS update (last-epoch roll + running-stats EMA) as ONE
    compiled program.

    Deliberately jitted as a unit: dispatched eagerly this is ~15 separate
    multi-device programs, and on hosts with more virtual devices than cores
    the XLA:CPU cross-program collective rendezvous can starve and F-abort
    the whole process (rendezvous.cc "Termination timeout ... Exiting to
    ensure a consistent program state").  One program also means one dispatch
    through the TPU tunnel instead of fifteen.
    """
    state = fds_update_last_epoch_stats(state, epoch, kernel_window)
    return fds_update_running_stats(
        state, features, labels, epoch, min_value, bin_width, cfg
    )


def fds_update_last_epoch_stats(
    state: Dict[str, jnp.ndarray],
    epoch,
    kernel_window: np.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Roll running stats into *_last_epoch and kernel-smooth over buckets
    (reference: fds.py:86-114).  Gated on epoch == state.epoch + 1."""
    win = jnp.asarray(kernel_window, jnp.float32)
    half = (len(kernel_window) - 1) // 2

    def smooth_buckets(arr):  # [nb, F] conv along bucket axis, reflect pad
        padded = jnp.pad(arr, ((half, half), (0, 0)), mode="reflect")
        # correlate (conv1d in torch flips nothing for F.conv1d: it's cross-correlation)
        idx = jnp.arange(arr.shape[0])[:, None] + jnp.arange(len(kernel_window))[None, :]
        return jnp.einsum("k,nkf->nf", win, padded[idx])

    do = epoch == state["epoch"] + 1.0

    def apply(s):
        out = dict(s)
        out["epoch"] = s["epoch"] + 1.0
        out["running_mean_last_epoch"] = s["running_mean"]
        out["running_var_last_epoch"] = s["running_var"]
        out["smoothed_mean_last_epoch"] = smooth_buckets(s["running_mean"])
        out["smoothed_var_last_epoch"] = smooth_buckets(s["running_var"])
        return out

    return jax.tree.map(
        lambda a, b: jnp.where(do, a, b), apply(state), state
    )
