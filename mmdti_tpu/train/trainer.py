"""Training orchestration: jit'd data-parallel train/eval steps.

Capability twin of the reference Trainer (/root/reference/tasks/trainer.py:29-556)
re-designed TPU-first:
  * one jit'd train step (forward + loss + grad + Adam update) compiled once
    thanks to static-shape batches; epoch enters as a traced scalar;
  * loss = alpha * task + beta * infonce + beta * ct with the same 4-way flag
    semantics (trainer.py:183-237); validation disables the contrastive terms
    (trainer.py:427-428);
  * bf16 matmuls + fp32 params instead of fp16 GradScaler; grad clipped at
    max_norm always (the reference clips only on its AMP path);
  * FDS epoch pass stays on device: pooled features collected by a jit'd
    eval-mode sweep, running stats updated with segment ops in HBM
    (no numpy round-trip, unlike trainer.py:288-306);
  * batches are sharded over the mesh 'data' axis; XLA all-reduces gradients
    over ICI and all-gathers the contrastive similarity inputs, preserving
    global-batch semantics;
  * early stop on val loss or the first metric, best checkpoint saved as
    msgpack (model_{fold}.ckpt).
"""

from __future__ import annotations

import os
import threading
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmdti_tpu.data.batching import CachedLoader, MolDataLoader, collate_dataset
from mmdti_tpu.data.pipeline import prefetch_to_device
from mmdti_tpu.losses.contrastive import CT_REGISTRY
from mmdti_tpu.losses.fds import fds_epoch_update
from mmdti_tpu.losses.registry import target_is_integer
from mmdti_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from mmdti_tpu.train.optim import make_fused_apply, make_optimizer
from mmdti_tpu.train.profiler import StepTimer
from mmdti_tpu.utils.logger import logger
from mmdti_tpu.utils.metrics import Metrics

_FEATURE_KEYS = (
    "src_tokens", "src_distance", "src_edge_type", "src_coord",
    "input_ids", "attention_mask",
    # MOF auxiliary inputs (models/mof.py MOFModel; absent on molecule data)
    "gas_id", "gas_attr", "pressure", "temperature",
)


def checkpoint_path(dump_dir: str, fold: int, backend: str = "msgpack") -> str:
    ext = "orbax" if backend == "orbax" else "ckpt"
    return os.path.join(dump_dir, f"model_{fold}.{ext}")


def save_checkpoint(dump_dir: str, fold: int, params, fds_state=None,
                    backend: str = "msgpack") -> None:
    """Persist the best-weights checkpoint (the MolPredict contract artifact).

    backend='msgpack' (default): single flax-msgpack file, reference-style.
    backend='orbax': an Orbax PyTree checkpoint directory — the JAX
    ecosystem's standard format (sharded-array friendly, multi-host capable);
    select via MolTrain(checkpoint_backend='orbax').  Loads autodetect.
    """
    if backend not in ("msgpack", "orbax"):
        raise ValueError(
            f"unknown checkpoint_backend {backend!r}; expected 'msgpack' or 'orbax'"
        )
    if jax.process_count() > 1 and jax.process_index() != 0:
        # multi-host: every process runs the identical trainer code against a
        # shared experiment dir — exactly one (process 0) writes artifacts
        # (tests/test_distributed_dcn.py asserts this)
        return
    os.makedirs(dump_dir, exist_ok=True)
    tree = {
        "params": jax.tree.map(np.asarray, params),
        "fds": jax.tree.map(np.asarray, fds_state) if fds_state is not None else {},
    }
    import shutil

    # remove the OTHER format's stale artifact so the autodetecting load
    # can never serve weights from an earlier run with a different backend
    orbax_path = os.path.abspath(checkpoint_path(dump_dir, fold, "orbax"))
    msgpack_path = checkpoint_path(dump_dir, fold)
    if backend == "orbax":
        if os.path.isdir(orbax_path):
            shutil.rmtree(orbax_path)
        if os.path.exists(msgpack_path):
            os.remove(msgpack_path)
        import orbax.checkpoint as ocp

        ocp.PyTreeCheckpointer().save(orbax_path, tree)
        return
    if os.path.isdir(orbax_path):
        shutil.rmtree(orbax_path)
    blob = flax.serialization.msgpack_serialize(tree)
    with open(msgpack_path, "wb") as f:
        f.write(blob)


def load_checkpoint(dump_dir: str, fold: int) -> Dict[str, Any]:
    """Load a best-weights checkpoint, autodetecting the backend format."""
    orbax_path = checkpoint_path(dump_dir, fold, "orbax")
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer().restore(os.path.abspath(orbax_path))
    msgpack_path = checkpoint_path(dump_dir, fold)
    if not os.path.exists(msgpack_path):
        raise FileNotFoundError(
            f"no checkpoint for fold {fold} in {dump_dir!r}: looked for "
            f"{os.path.basename(msgpack_path)} (msgpack) and "
            f"{os.path.basename(orbax_path)}/ (orbax directory)"
        )
    with open(msgpack_path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


# ---- full train-state checkpointing (mid-training resume; capability the
# reference lacks — it saves best weights only, tasks/trainer.py:373-379) ----

def train_state_path(dump_dir: str, fold: int) -> str:
    return os.path.join(dump_dir, f"train_state_{fold}.ckpt")


def save_train_state(dump_dir, fold, params, opt_state, fds_state, epoch, global_step,
                     best_params=None, early_stop=None, loss_state=None):
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # single-writer rule (see save_checkpoint)
    os.makedirs(dump_dir, exist_ok=True)
    blob_dict = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state)
        ),
        "fds": jax.tree.map(np.asarray, fds_state) if fds_state is not None else {},
        "epoch": np.asarray(epoch),
        "global_step": np.asarray(global_step),
    }
    if loss_state is not None:
        # stateful-loss carry (GHM's EMA bin counts) — a resume without it
        # would silently restart the gradient-density weighting from scratch
        blob_dict["loss_state"] = [np.asarray(x) for x in jax.tree.leaves(loss_state)]
    # Best-so-far weights + early-stop tracking, so a resumed run keeps the
    # true best checkpoint instead of restarting the search from the resume
    # point.  early_stop: {"min_val_loss", "wait", "best_score"} floats.
    if best_params is not None:
        blob_dict["best_params"] = jax.tree.map(np.asarray, best_params)
    if early_stop is not None:
        blob_dict["early_stop"] = {k: np.asarray(float(v)) for k, v in early_stop.items()}
    blob = flax.serialization.msgpack_serialize(blob_dict)
    tmp = train_state_path(dump_dir, fold) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, train_state_path(dump_dir, fold))


def load_train_state(dump_dir, fold, opt_state_template):
    with open(train_state_path(dump_dir, fold), "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    opt_state = flax.serialization.from_state_dict(opt_state_template, raw["opt_state"])
    fds = raw["fds"] if raw["fds"] else None
    extra = {
        "best_params": raw.get("best_params"),
        "early_stop": {k: float(v) for k, v in raw["early_stop"].items()}
        if raw.get("early_stop")
        else None,
        # flat leaves; the caller re-assembles with its template's treedef
        "loss_state_leaves": raw.get("loss_state"),
    }
    return raw["params"], opt_state, fds, int(raw["epoch"]), int(raw["global_step"]), extra


class _AsyncSaver:
    """Background train-state writer (one in-flight save at a time).

    A periodic checkpoint_interval save costs a full device->host pull of
    params+optimizer (~GB) plus serialization — tens of seconds on thin host
    links — and used to stall the epoch loop for all of it.  The loop now
    snapshots on DEVICE (one jit'd copy, milliseconds) and hands the
    pull+write to this thread.  submit() joins the previous save first, so
    at most one snapshot's extra HBM is held; a failed write re-raises at
    the next submit()/wait() instead of vanishing in the thread."""

    def __init__(self):
        self._thread = None
        self._exc = None

    def submit(self, fn) -> None:
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # propagate on next join
                self._exc = e

        t = threading.Thread(target=run, daemon=True, name="mmdti-ckpt-writer")
        t.start()
        self._thread = t

    def wait(self) -> None:
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def history_path(dump_dir: str, fold: int) -> str:
    return os.path.join(dump_dir, f"history_{fold}.json")


def _write_history(dump_dir: Optional[str], fold: int, history) -> None:
    """Persist the per-epoch scalar log (SURVEY §5 observability): the
    reference only has its console log line; this is the parseable artifact
    dashboards/regression tooling read.  Rewritten every epoch (~KB) so a
    crash or resume never loses earlier epochs' rows."""
    if not dump_dir:
        return
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # single-writer rule (see save_checkpoint)
    import json

    with open(history_path(dump_dir, fold), "w") as f:
        json.dump(history, f, indent=1)


def _load_history(dump_dir: Optional[str], fold: int, upto_epoch: int):
    """Rows from a previous run's artifact, truncated to resumed epochs."""
    if not dump_dir or not os.path.exists(history_path(dump_dir, fold)):
        return []
    import json

    try:
        with open(history_path(dump_dir, fold)) as f:
            rows = json.load(f)
        return [r for r in rows if int(r.get("epoch", 0)) <= upto_epoch]
    except Exception:  # a corrupt artifact must not block training
        return []


@jax.jit
def _metric_sums(m):
    """Per-key sum of one dispatch's metrics (scalar or [K] from the scan)."""
    return {k: jnp.sum(v) for k, v in m.items()}


@partial(jax.jit, donate_argnums=(0,))
def _metric_acc(acc, m):
    """Fold one dispatch's metric sums into the running per-key totals.

    Fixed arity on purpose: the per-epoch reduction stays O(1) in dataset
    size — an N-ary epoch-end program would retrace per step count and ship
    an HLO with one parameter per step (the remote-compile request-size
    gotcha at scale).  The division by the host-tracked step count happens
    on host after ONE scalar pull per key."""
    return {k: acc[k] + jnp.sum(m[k]) for k in m}


@jax.jit
def _copy_tree(tree):
    """Device-side deep copy as ONE compiled program.

    Used for the best-params snapshot each improving epoch: an eager
    jax.tree.map(jnp.copy, ...) dispatches one tiny op per leaf (~hundreds),
    which is pure host/tunnel latency.  jit outputs never alias non-donated
    inputs, so the snapshot survives later donation of `tree`'s buffers."""
    return jax.tree.map(jnp.copy, tree)


def _make_batch_loss(loss_fn):
    """Validation batch loss that ignores padded trailing rows exactly.

    Padded rows repeat the last sample and must not bias the val loss.
    NaN-maskable losses exclude them exactly by NaN labels; otherwise per-row
    vmap + row-weighted mean over the first valid_n rows (exact for
    row-decomposable means: mse/ce/bce)."""
    if getattr(loss_fn, "nan_maskable", False):
        def batch_loss(logits, labels, valid_n):
            keep = jnp.arange(logits.shape[0]) < valid_n
            keep = keep.reshape((-1,) + (1,) * (labels.ndim - 1))
            masked = jnp.where(keep, labels.astype(jnp.float32), jnp.nan)
            return loss_fn(logits, masked)
    else:
        def batch_loss(logits, labels, valid_n):
            keep = (jnp.arange(logits.shape[0]) < valid_n).astype(jnp.float32)
            per_row = jax.vmap(lambda lg, lb: loss_fn(lg[None], lb[None]))(
                logits, labels
            )
            return jnp.sum(per_row * keep) / jnp.maximum(
                valid_n.astype(jnp.float32), 1.0
            )
    return batch_loss


def _normalize_device_feed(value):
    """Map every accepted device_feed spelling onto {'auto', True, False}.

    YAML/CLI round trips turn booleans into strings; a truthy 'false' or
    'off' silently behaving as auto (or a 'true' that only *requests* the
    feed) would be a misconfiguration the user never sees."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v == "auto":
            return "auto"
        if v in ("true", "on", "1", "yes"):
            return True
        if v in ("false", "off", "0", "no", ""):
            return False
        raise ValueError(
            f"device_feed={value!r} not understood: expected 'auto', "
            "True/'true'/'on', or False/'false'/'off'"
        )
    if value is None:
        return False
    if isinstance(value, (bool, int)):
        return bool(value)
    raise ValueError(f"device_feed={value!r} not understood")


def _weighted_loss_mean(val_losses) -> float:
    """Row-weighted mean of per-batch (loss, n_valid_rows) pairs."""
    if not val_losses:
        return 0.0
    total_n = sum(n for _, n in val_losses)
    return float(sum(l * n for l, n in val_losses) / max(total_n, 1))


class Trainer:
    def __init__(self, save_path: Optional[str] = None, **params):
        self.save_path = save_path
        self.task = params.get("task", None)
        self.metrics_str = params.get("metrics", "none")
        self.metrics = Metrics(self.task, self.metrics_str) if self.task != "repr" else None
        self.seed = params.get("seed", 42)
        np.random.seed(self.seed)
        self.learning_rate = float(params.get("learning_rate", 1e-4))
        self.batch_size = int(params.get("batch_size", 32))
        self.max_epochs = int(params.get("epochs", params.get("max_epochs", 50)))
        self.warmup_ratio = float(params.get("warmup_ratio", 0.1))
        self.patience = int(params.get("patience", 10))
        self.max_norm = float(params.get("max_norm", 1.0))
        self.mu_dtype = params.get("mu_dtype", "bfloat16")
        self.alpha = float(params.get("alpha", 1))
        self.beta = float(params.get("beta", 0.1))
        self.fds = params.get("fds", False)
        self.ct_w = float(params.get("ct_w", 0.2))
        # full-state checkpointing every N epochs (0 = off) + resume
        self.checkpoint_interval = int(params.get("checkpoint_interval", 0) or 0)
        self.checkpoint_backend = params.get("checkpoint_backend", "msgpack")
        # periodic saves run in a background writer thread by default (the
        # device->host pull + serialize otherwise stalls the epoch loop)
        self.async_checkpoint = bool(params.get("async_checkpoint", True))
        self.resume = bool(params.get("resume", False))
        # budgeted sessions: complete at most this absolute (1-based) epoch
        # this invocation, persist the full train state, and return.  The LR
        # schedule horizon stays `epochs`, the shuffle stream is realigned on
        # resume, and the dropout PRNG is global_step-keyed — so a later
        # resume=True run continues the IDENTICAL trajectory the
        # uninterrupted run would have produced (tests/test_train.py::
        # TestResumeE2E::test_interrupted_run_matches_uninterrupted).
        self.stop_after_epoch = int(params.get("stop_after_epoch", 0) or 0)
        # train steps fused per device dispatch (amortizes host/RPC latency).
        # Explicitness matters: with the device feed the best K is the WHOLE
        # epoch (scan compile cost is O(1) in trip count; only the [K,B]
        # index block grows), so the feed path uses epoch-sized dispatches
        # unless the user pinned a K themselves.
        _spc = params.get("steps_per_call", None)
        self.steps_per_call_explicit = _spc is not None
        self.steps_per_call = int(_spc if _spc is not None else 4) or 1
        # device-resident input feed: collate the whole dataset once, keep the
        # arrays in HBM, and turn per-step batching into an on-device row
        # gather inside the jit'd scan.  Kills the steady-state host work
        # (tokenize/pad/stack) AND the per-batch H2D transfer that made the
        # fit loop host-bound (~470 of a possible ~1490 mols/s, fit_probe).
        # 'auto' engages when padding is static and the estimated resident
        # bytes fit device_feed_bytes (per device; arrays are replicated).
        # Normalized strictly up front: truthy non-bool spellings ('true',
        # 1, 'off', ...) must not silently fall into auto semantics.
        self.device_feed = _normalize_device_feed(params.get("device_feed", "auto"))
        self.device_feed_bytes = int(params.get("device_feed_bytes", 1 << 30))
        # gradient accumulation: K micro-batches average into one optimizer
        # update (effective batch = K * batch_size without the activation
        # memory).  Batch-coupled losses (InfoNCE negatives, ConR pairs, GHM
        # bins) see the micro-batch, not the effective batch — same trade
        # every accumulation implementation makes.
        self.accumulate_steps = int(params.get("accumulate_steps", 1) or 1)
        # xprof tracing of the first profile_steps dispatches + per-epoch
        # StepTimer p50/p95 logging (train/profiler.py; SURVEY §5)
        self.profile_dir = params.get("profile_dir", None)
        self.profile_steps = int(params.get("profile_steps", 5) or 5)
        # NaN sanitizer (SURVEY §5): debug_nans=True makes every jit'd step
        # fail loudly at the first non-finite intermediate instead of
        # training onward on garbage — MolTrain(debug_nans=True)
        if params.get("debug_nans"):
            from mmdti_tpu.train.profiler import enable_nan_debugging

            enable_nan_debugging()
        mesh_shape = params.get("mesh_shape", None)
        self.mesh = params.get("mesh", None) or make_mesh(
            tuple(mesh_shape) if mesh_shape else None
        )
        # register the mesh for the fused Pallas kernels (they self-wrap in
        # shard_map over it — pallas_call has no GSPMD rule; see
        # ops/pallas_attention.py).  Re-asserted at fit/predict entry because
        # the registry is THREAD-LOCAL (jit traces on the dispatching
        # thread): another Trainer/MolServe on this thread may have
        # re-registered in between, and any worker thread that dispatches
        # steps must re-register for itself (as serve_api does).
        self._register_kernel_mesh()
        # every batch (train via drop_last, val/predict via _pad_to_batch)
        # has exactly batch_size rows, and those rows shard over the data
        # axis — a non-divisible batch_size would fail device_put outright
        data_par = self.mesh.shape[DATA_AXIS]
        if self.batch_size % data_par:
            rounded = -(-self.batch_size // data_par) * data_par
            logger.warning(
                "batch_size %d is not divisible by the %d-way data mesh "
                "axis; rounding up to %d", self.batch_size, data_par, rounded,
            )
            self.batch_size = rounded
        self._compiled: Dict[str, Callable] = {}

    def _register_kernel_mesh(self) -> None:
        from mmdti_tpu.parallel.mesh import set_kernel_mesh

        set_kernel_mesh(self.mesh)

    def _replicate_for_host_pull(self, tree):
        """Inside a jit'd eval fn: constrain outputs that the host will pull
        to the replicated sharding when running multi-host.  Batch-sharded
        outputs are not fully addressable across processes, so a plain
        device_get would fail; the constraint inserts the all-gather inside
        the compiled program (executed by every process in lockstep).
        Single-process: identity — no resharding is introduced."""
        if jax.process_count() == 1:
            return tree
        rep = replicated(self.mesh)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, rep), tree
        )

    def _memo(self, key, pins, builder):
        """Per-Trainer cache of built (jit-wrapped) step functions.

        Reusing the same function objects across fit_predict calls (CV folds,
        the final best-weights predict) lets JAX's in-process executable
        cache serve repeat compilations — the TPU backend pays a full remote
        compile per NEW function object even for an identical program.
        `pins` are the objects the key identifies by id(); storing them keeps
        those ids alive so a collected object can never alias a stale entry.
        """
        hit = self._compiled.get(key)
        if hit is None:
            hit = (pins, builder())
            self._compiled[key] = hit
        return hit[1]

    def _place_params(self, tree):
        """Parameter placement for the mesh: TP_RULES partitioning over the
        'model' axis when it is >1 (DPxTP), full replication otherwise."""
        from mmdti_tpu.parallel.mesh import param_sharding

        if self.mesh.shape[MODEL_AXIS] > 1:
            return jax.device_put(tree, param_sharding(self.mesh, tree))
        return replicate(self.mesh, tree)

    def _commit_aux_state(self, tree):
        """Commit every leaf of a train-state tree to this fit's mesh.

        Leaves already carrying a NamedSharding on the mesh (Adam moments
        inherited eagerly from the placed params, possibly TP-partitioned)
        are kept; everything else (optax step counters born as uncommitted
        scalars in tx.init, the loss-state placeholder, numpy leaves from a
        resume restore) is replicated.  Without this the first train
        dispatch sees uncommitted avals while its own outputs come back
        mesh-committed, so dispatch #2 RETRACES and RECOMPILES the whole
        step — measured ~38s of remote compile per fit on the tunneled
        flagship (it surfaced as a one-off 37.8s "epoch 2" once the device
        feed made each epoch a single dispatch)."""
        from jax.sharding import NamedSharding

        rep = replicated(self.mesh)

        def place(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == self.mesh:
                return x
            return jax.device_put(x, rep)

        return jax.tree.map(place, tree)

    # ------------------------------------------------------------------
    def _split_batch(self, batch: Dict[str, np.ndarray]):
        feats = {k: batch[k] for k in _FEATURE_KEYS if k in batch}
        weights = batch.get("weights")
        return feats, weights

    def _feed_engaged(self, collate_fn, *datasets) -> bool:
        """Decide whether the device-resident input feed runs this fit.

        device_feed=False: never.  True: forced (static padding required —
        per-batch bucket widths cannot live in one resident array).  'auto'
        (default): engage when padding is static and the estimated resident
        bytes (probe-collation extrapolation over all datasets) fit
        device_feed_bytes per device."""
        mode = self.device_feed  # {'auto', True, False} post-normalization
        if mode is False:
            return False
        static = getattr(collate_fn, "pad_mode", None) in ("dataset", "fixed")
        if not static:
            if mode is True:
                raise ValueError(
                    "device_feed=True requires static padding (pad_mode "
                    f"'dataset' or 'fixed'); got {getattr(collate_fn, 'pad_mode', None)!r}"
                )
            return False
        if mode is True:
            return True
        total = 0
        for ds in datasets:
            if len(ds) == 0:
                continue
            # under static pads every collated row has identical bytes, so a
            # tiny probe gives the EXACT per-row size
            probe_n = min(len(ds), 8)
            batch, labels = collate_fn([ds[i] for i in range(probe_n)])
            feats, weights = self._split_batch(batch)
            per = sum(a.nbytes for a in feats.values()) + labels.nbytes
            if weights is not None:
                per += weights.nbytes
            total += int(per / probe_n * len(ds))
        if total > self.device_feed_bytes:
            logger.info(
                "device_feed auto-disabled: ~%.0f MB resident inputs exceed "
                "the %.0f MB cap (device_feed_bytes)",
                total / 1e6, self.device_feed_bytes / 1e6,
            )
            return False
        return True

    def _dataset_to_device(self, dataset, collate_fn):
        """Collate the whole dataset once and place it resident (replicated)
        on the mesh.  Returns (feats, labels, weights) device arrays plus the
        host label rows (for metrics / truth columns)."""
        batch, labels = collate_dataset(dataset, collate_fn)
        feats, weights = self._split_batch(batch)
        labels_h = self._labels_host(labels)
        w_h = (
            np.asarray(weights, np.float32)
            if weights is not None
            else np.ones((labels.shape[0], 1), np.float32)
        )
        feats_d, labels_d, w_d = jax.device_put(
            (feats, labels_h, w_h), replicated(self.mesh)
        )
        return feats_d, labels_d, w_d, labels

    def build_eval_device_data(self, model, dataset, collate_fn, loss_fn,
                               activation_fn, eval_sweep=None):
        """Assemble the device-resident eval bundle consumed by
        predict(device_data=...): resident arrays + batch index matrix +
        the jit'd sweep."""
        feats_d, labels_d, _, labels_host = self._dataset_to_device(
            dataset, collate_fn
        )
        idx, valid_ns = MolDataLoader(
            dataset, self.batch_size, collate_fn
        ).epoch_index_matrix()
        idx_d, ns_d = jax.device_put(
            (idx, np.asarray(valid_ns, np.int32)), replicated(self.mesh)
        )
        return {
            "feats": feats_d, "labels": labels_d,
            "idx": idx_d, "valid_ns_dev": ns_d, "valid_ns": valid_ns,
            "labels_host": labels_host,
            "eval_sweep": eval_sweep
            or self._memo(
                ("sweep", id(model), id(loss_fn), id(activation_fn), False),
                (model, loss_fn, activation_fn),
                lambda: self.build_eval_sweep(model, loss_fn, activation_fn),
            ),
        }

    def _pad_to_batch(self, batch, labels):
        """Pad a trailing partial batch up to batch_size (static shapes)."""
        n = labels.shape[0]
        if n == self.batch_size:
            return batch, labels, n
        reps = self.batch_size - n

        def pad(x):
            return np.concatenate([x, np.repeat(x[-1:], reps, axis=0)], axis=0)

        return jax.tree.map(pad, batch), pad(labels), n

    def _labels_host(self, labels: np.ndarray) -> np.ndarray:
        """Dtype-normalized host array (device placement happens in the
        caller's batched device_put)."""
        dt = np.int32 if target_is_integer(self.task) else np.float32
        return np.asarray(labels, dt)

    # ------------------------------------------------------------------
    def build_train_step(
        self,
        model,
        tx,
        loss_fn,
        use_infonce: bool,
        use_ct: bool,
        use_weight: bool,
        fds_bucket=(0.0, 1.0),
        stateful_loss=None,
        fused_apply=None,
    ):
        """stateful_loss: optional fn(logits, labels, state) -> (loss, state)
        replacing loss_fn — used for GHM's EMA bin counts (the reference keeps
        them as module state across steps, models/loss.py:81-85).

        fused_apply: optional optim.make_fused_apply function replacing
        tx.update + the separate ``p + u`` tree.map — bit-identical under jit
        (tests/test_train.py::TestFusedAdamApply) but one fusion per leaf:
        the updates tree (296 MB at flagship scale) and the 2.48 ms/step
        params re-stream it caused (round-5 xprof) never exist."""
        ct_fn = CT_REGISTRY.get(self.task) if use_ct else None
        alpha, beta, ct_w = self.alpha, self.beta, self.ct_w
        steps_per_call = self.steps_per_call

        def loss_inner(params, fds_state, loss_state, feats, labels, weights, epoch, rng):
            out = model.apply(
                {"params": params},
                **feats,
                deterministic=False,
                fds_state=fds_state,
                net_target=labels.astype(jnp.float32),
                epoch=epoch,
                fds_bucket=fds_bucket,
                rngs={"dropout": rng},
            )
            if stateful_loss is not None:
                task_loss, new_loss_state = stateful_loss(out["logits"], labels, loss_state)
            else:
                task_loss = loss_fn(out["logits"], labels)
                new_loss_state = loss_state
            total = alpha * task_loss
            infonce = out["infonce_loss"]
            if use_infonce:
                total = total + beta * infonce
            if ct_fn is not None:
                ct = ct_fn(
                    out["pooled"], labels, out["logits"],
                    weights=weights if use_weight else None, w=ct_w,
                )
                total = total + beta * ct
            else:
                ct = jnp.zeros(())
            aux = {"loss": total, "m_loss": task_loss,
                   "infonce_loss": infonce, "ct_loss": ct}
            return total, (aux, new_loss_state)

        grad_fn = jax.value_and_grad(loss_inner, has_aux=True)

        def one_step(params, opt_state, fds_state, loss_state, feats, labels, weights, epoch, rng):
            (_, (metrics, loss_state)), grads = grad_fn(
                params, fds_state, loss_state, feats, labels, weights, epoch, rng
            )
            if fused_apply is not None:
                params, opt_state = fused_apply(grads, opt_state, params)
            else:
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss_state, metrics

        train_step = partial(jax.jit, donate_argnums=(0, 1))(one_step)

        # device-feed variant: the dataset lives on device (replicated) and
        # each scan step gathers its batch rows by index — no host collation,
        # no per-batch H2D.  idx_k: [K, batch] int32.  Dataset arrays are
        # ARGUMENTS (closing over them would embed them as compile-time
        # constants — the remote-compile HTTP 413 gotcha, CLAUDE.md).
        bsh = batch_sharding(self.mesh)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_steps_feed(params, opt_state, fds_state, loss_state,
                             feats_all, labels_all, weights_all, idx_k,
                             epoch, rngs_k):
            def take(x, i):
                return jax.lax.with_sharding_constraint(
                    jnp.take(x, i, axis=0), bsh
                )

            def body(carry, xs):
                p, o, ls = carry
                idx, rng = xs
                feats = {k: take(v, idx) for k, v in feats_all.items()}
                p, o, ls, m = one_step(
                    p, o, fds_state, ls, feats, take(labels_all, idx),
                    take(weights_all, idx), epoch, rng,
                )
                return (p, o, ls), m

            (params, opt_state, loss_state), metrics = jax.lax.scan(
                body, (params, opt_state, loss_state), (idx_k, rngs_k),
            )
            return params, opt_state, loss_state, metrics

        if steps_per_call <= 1:
            return train_step, None, train_steps_feed

        # multi-step variant: lax.scan over K pre-staged batches per dispatch
        # (amortizes host->device dispatch latency; same math as K single steps)
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_steps(params, opt_state, fds_state, loss_state, feats_k, labels_k,
                        weights_k, epoch, rngs_k):
            def body(carry, xs):
                p, o, ls = carry
                feats, labels, weights, rng = xs
                p, o, ls, m = one_step(p, o, fds_state, ls, feats, labels, weights, epoch, rng)
                return (p, o, ls), m

            (params, opt_state, loss_state), metrics = jax.lax.scan(
                body, (params, opt_state, loss_state),
                (feats_k, labels_k, weights_k, rngs_k),
            )
            return params, opt_state, loss_state, metrics

        return train_step, train_steps, train_steps_feed

    def build_eval_step(self, model, loss_fn, activation_fn):
        alpha = self.alpha
        batch_loss = _make_batch_loss(loss_fn)

        @jax.jit
        def eval_step(params, feats, labels, valid_n):
            out = model.apply({"params": params}, **feats, deterministic=True)
            preds = activation_fn(out["logits"])
            loss = alpha * batch_loss(out["logits"], labels, valid_n)
            ys = (preds, loss, out["pooled"], out["cls_repr"])
            return self._replicate_for_host_pull(ys)

        return eval_step

    def build_eval_sweep(self, model, loss_fn, activation_fn,
                         with_pooled: bool = False):
        """Full-sweep eval over the device-resident dataset in ONE dispatch.

        lax.scan over [nb, B] index rows of the resident arrays: the whole
        validation (or FDS feature) pass costs one program dispatch and one
        batched host pull instead of nb collations + transfers + round trips.
        Returns (preds [nb,B,...], losses [nb]); with_pooled=True (the FDS
        feature sweep) additionally returns (pooled [nb*B, D], labels_f32
        [nb*B, ...]) for fds_epoch_update — validation/predict sweeps skip
        those outputs so no O(n·D) stack is materialized in HBM."""
        alpha = self.alpha
        batch_loss = _make_batch_loss(loss_fn)
        bsh = batch_sharding(self.mesh)

        @jax.jit
        def eval_sweep(params, feats_all, labels_all, idx_mat, valid_ns):
            def take(x, i):
                return jax.lax.with_sharding_constraint(
                    jnp.take(x, i, axis=0), bsh
                )

            def body(_, xs):
                idx, vn = xs
                feats = {k: take(v, idx) for k, v in feats_all.items()}
                labels = take(labels_all, idx)
                out = model.apply({"params": params}, **feats, deterministic=True)
                preds = activation_fn(out["logits"])
                loss = alpha * batch_loss(out["logits"], labels, vn)
                ys = (preds, loss)
                if with_pooled:
                    ys += (out["pooled"], labels.astype(jnp.float32))
                return None, ys

            _, ys = jax.lax.scan(body, None, (idx_mat, valid_ns))
            if not with_pooled:
                return self._replicate_for_host_pull(ys)
            preds, losses, pooled, labels_f = ys
            pooled = pooled.reshape((-1,) + pooled.shape[2:])
            labels_f = labels_f.reshape((-1,) + labels_f.shape[2:])
            # pooled/labels feed fds_epoch_update ON DEVICE — only the
            # host-pulled outputs need the multi-host replication
            preds, losses = self._replicate_for_host_pull((preds, losses))
            return preds, losses, pooled, labels_f

        return eval_sweep

    # ------------------------------------------------------------------
    def fit_predict(
        self,
        model,
        params,
        train_dataset,
        valid_dataset,
        loss_fn,
        activation_fn,
        dump_dir: str,
        fold: int,
        target_scaler,
        collate_fn,
        use_infonce: bool = False,
        use_ct: bool = False,
        use_weight: bool = False,
        fds_state=None,
        fds_bucket=(0.0, 1.0),
        fds_kernel=None,
        fds_start_update: int = 0,
        frozen_mask=None,
        stateful_loss=None,
        loss_state=None,
    ):
        self._register_kernel_mesh()
        train_loader = MolDataLoader(
            train_dataset, self.batch_size, collate_fn,
            shuffle=True, drop_last=True, seed=self.seed,
        )
        steps_per_epoch = len(train_loader)
        if steps_per_epoch == 0:
            raise ValueError(
                f"train set ({len(train_dataset)}) smaller than batch size {self.batch_size}"
            )
        # the LR schedule runs in optimizer *updates*: with gradient
        # accumulation, MultiSteps only advances the inner (clip+adam) state
        # every K micro-steps, so the schedule horizon is micro_steps // K
        num_updates = max(1, steps_per_epoch * self.max_epochs // self.accumulate_steps)

        # Memoized per (model, losses, flags, schedule horizon): a CV run
        # calls fit_predict once per fold, and rebuilding the jit'd step
        # closures would RETRACE AND RECOMPILE the identical program each
        # fold — the axon TPU backend cannot serialize its big executables
        # (CLAUDE.md), so that is minutes of remote compile per fold.  Reusing
        # the same function objects makes fold 2+ hit JAX's in-process
        # executable cache.  The key carries ids; the value pins the keyed
        # objects so a GC'd model can never alias a stale entry.
        def _build_train():
            tx_, _ = make_optimizer(
                self.learning_rate, num_updates, self.warmup_ratio, self.max_norm,
                frozen_mask=frozen_mask, mu_dtype=self.mu_dtype,
            )
            fused_apply = None
            if self.accumulate_steps > 1:
                tx_ = optax.MultiSteps(tx_, every_k_schedule=self.accumulate_steps)
            else:
                # fused clip+Adam+apply (same init/state layout as tx_;
                # bit-identical under jit) — MultiSteps keeps the generic
                # update path since its state wraps the chain's
                fused_apply = make_fused_apply(
                    self.learning_rate, num_updates, self.warmup_ratio,
                    self.max_norm, frozen_mask=frozen_mask,
                    mu_dtype=self.mu_dtype,
                )
            steps = self.build_train_step(
                model, tx_, loss_fn, use_infonce, use_ct, use_weight, fds_bucket,
                stateful_loss=stateful_loss, fused_apply=fused_apply,
            )
            return (tx_, *steps)

        train_key = (
            "train", id(model), id(loss_fn), id(stateful_loss), id(frozen_mask),
            use_infonce, use_ct, use_weight, tuple(fds_bucket), num_updates,
        )
        tx, train_step, train_steps, train_steps_feed = self._memo(
            train_key, (model, loss_fn, stateful_loss, frozen_mask), _build_train
        )
        params = self._place_params(params)
        opt_state = self._commit_aux_state(tx.init(params))
        if fds_state is not None:
            fds_state = replicate(self.mesh, fds_state)

        if loss_state is None:
            loss_state = jnp.zeros((0,), jnp.float32)  # placeholder pytree leaf
        loss_state = self._commit_aux_state(loss_state)
        eval_step = self._memo(
            ("eval", id(model), id(loss_fn), id(activation_fn)),
            (model, loss_fn, activation_fn),
            lambda: self.build_eval_step(model, loss_fn, activation_fn),
        )

        # ---- device-resident input feed (device_feed) --------------------
        # Collate train+val ONCE, keep the arrays in HBM, and run batching as
        # on-device row gathers: per-epoch host work and per-batch H2D vanish
        # (the fit loop was host-bound at ~1/3 of device throughput without
        # this — scripts/fit_probe.py / collate_probe.py).
        feed_on = self._feed_engaged(collate_fn, train_dataset, valid_dataset)
        eval_sweep = None
        val_device_data = None
        if feed_on:
            tr_feats, tr_labels, tr_weights, _ = self._dataset_to_device(
                train_dataset, collate_fn
            )
            eval_sweep = self._memo(
                ("sweep", id(model), id(loss_fn), id(activation_fn), False),
                (model, loss_fn, activation_fn),
                lambda: self.build_eval_sweep(model, loss_fn, activation_fn),
            )
            val_device_data = self.build_eval_device_data(
                model, valid_dataset, collate_fn, loss_fn, activation_fn,
                eval_sweep=eval_sweep,
            )
            logger.info(
                "device_feed engaged: %d train + %d val molecules resident "
                "on device", len(train_dataset), len(valid_dataset),
            )

        start_epoch = 0
        global_step = 0
        resume_extra = None
        if self.resume and os.path.exists(train_state_path(dump_dir, fold)):
            p_h, opt_state, fds_h, last_epoch, global_step, resume_extra = load_train_state(
                dump_dir, fold, opt_state
            )
            opt_state = self._commit_aux_state(opt_state)
            params = self._place_params(p_h)
            if fds_h is not None:
                fds_state = replicate(self.mesh, fds_h)
            if resume_extra.get("loss_state_leaves") is not None:
                # restore the stateful-loss carry (GHM EMA bins) with this
                # run's treedef — a fresh run would otherwise restart the
                # gradient-density weighting from zeroed bins
                loss_state = self._commit_aux_state(
                    jax.tree_util.tree_unflatten(
                        jax.tree_util.tree_structure(loss_state),
                        [jnp.asarray(x) for x in resume_extra["loss_state_leaves"]],
                    )
                )
            start_epoch = last_epoch + 1
            # align the shuffle stream with the uninterrupted run: the fresh
            # loader's RNG must skip the permutations already consumed
            train_loader.advance_epochs(start_epoch)
            logger.info("Resumed train state from epoch %d", last_epoch)

        base_rng = jax.random.PRNGKey(self.seed)
        fds_loader = None
        fds_idx_dev = fds_ns_dev = fds_sweep = None
        valid_loader = CachedLoader(MolDataLoader(valid_dataset, self.batch_size, collate_fn))
        # Device COPIES: the first train step donates `params`/`opt_state`
        # buffers (donate_argnums), so aliasing `params` here would leave
        # best_params pointing at deleted arrays if no epoch ever improves
        # (e.g. NaN validation loss from epoch 1) — crashing save_checkpoint
        # at the end of fit.  Donation is a no-op on CPU, so only real-device
        # runs hit the aliasing.
        best_params = _copy_tree(params)
        best_fds = _copy_tree(fds_state) if fds_state is not None else None
        min_val_loss = float("inf")
        best_score = self.metrics.initial_best() if self.metrics else None
        use_metric_stop = isinstance(self.metrics_str, str) and self.metrics_str not in (
            "loss", "none", "",
        )
        wait = 0
        # per-epoch scalars -> history_{fold}.json artifact; on resume, keep
        # the previous run's rows up to the resumed epoch
        history: list = _load_history(dump_dir, fold, start_epoch)
        if resume_extra:
            if resume_extra.get("best_params") is not None:
                best_params = self._place_params(resume_extra["best_params"])
            es = resume_extra.get("early_stop")
            if es:
                min_val_loss = es.get("min_val_loss", min_val_loss)
                wait = int(es.get("wait", 0))
                if use_metric_stop and not np.isnan(es.get("best_score", float("nan"))):
                    best_score = es["best_score"]

        bsh = batch_sharding(self.mesh)
        ckpt_saver = _AsyncSaver()

        def put_on_device(item):
            """H2D transfer for one batch (runs inside the prefetch window).

            ONE device_put for the whole (feats, labels, weights) tree —
            separate puts each pay the tunnel's fixed per-transfer cost."""
            batch, labels = item
            feats, weights = self._split_batch(batch)
            labels_h = self._labels_host(labels)
            w_h = (
                np.asarray(weights, np.float32)
                if weights is not None
                else np.ones((labels.shape[0], 1), np.float32)
            )
            return jax.device_put((feats, labels_h, w_h), bsh)

        # profiling hooks: trace the first profile_steps dispatches into
        # profile_dir + per-epoch step-time p50/p95 (no-ops when off; the
        # StepTimer's block_until_ready sync would serialize async dispatch)
        profiling = bool(self.profile_dir)
        trace_state = {"active": False, "dispatches": 0}
        step_timer = StepTimer() if profiling else None

        def dispatch_begin():
            if not profiling:
                return
            if epoch == start_epoch and trace_state["dispatches"] == 0:
                jax.profiler.start_trace(self.profile_dir)
                trace_state["active"] = True
            step_timer.start()

        def dispatch_end(result):
            if not profiling:
                return
            step_timer.stop(result)
            trace_state["dispatches"] += 1
            if trace_state["active"] and trace_state["dispatches"] >= self.profile_steps:
                jax.profiler.stop_trace()
                trace_state["active"] = False
                logger.info("Profiler trace written to %s", self.profile_dir)

        K = self.steps_per_call if train_steps is not None else 1
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            metric_acc, metric_count = None, 0
            epoch_f = jnp.asarray(epoch, jnp.float32)

            def accumulate(m, n):
                nonlocal metric_acc, metric_count
                metric_acc = (
                    _metric_sums(m) if metric_acc is None
                    else _metric_acc(metric_acc, m)
                )
                metric_count += n

            def run_single(item):
                nonlocal params, opt_state, loss_state, global_step
                feats, labels_d, w_d = item
                rng = jax.random.fold_in(base_rng, global_step)
                dispatch_begin()
                params, opt_state, loss_state, m = train_step(
                    params, opt_state, fds_state, loss_state, feats, labels_d,
                    w_d, epoch_f, rng,
                )
                dispatch_end(m)
                accumulate(m, 1)
                global_step += 1

            if feed_on:
                # device-feed path: one [kk, B] int32 index block per
                # dispatch is the ONLY per-step host work and transfer.
                # Default: the WHOLE epoch per dispatch — the scan body
                # compiles once regardless of trip count, so epoch-sized
                # dispatches cost nothing extra to build and remove every
                # per-K host round trip.  An explicit steps_per_call pins K
                # (useful for profiling granularity).
                idx_mat, _ = train_loader.epoch_index_matrix()
                nb = idx_mat.shape[0]
                # profiling keeps K-sized dispatches: an epoch-sized trace
                # window would be unreadable (and huge on disk)
                K_feed = K if (self.steps_per_call_explicit or profiling) else nb
                K_feed = max(1, min(K_feed, nb))
                if nb % K_feed:
                    # a trailing partial [kk,B] index block is a different
                    # scan shape: it would RETRACE and RECOMPILE the whole
                    # train program (minutes of remote compile on the
                    # tunneled flagship).  Snap K down to the largest
                    # divisor of nb so every dispatch shares one shape —
                    # dispatch grouping never changes the math (same
                    # batches, same global-step-keyed rngs).
                    k_div = next(d for d in range(K_feed, 0, -1) if nb % d == 0)
                    if epoch == start_epoch:
                        logger.info(
                            "steps_per_call %d does not divide the %d-batch "
                            "epoch; using %d per dispatch (avoids a second "
                            "compile for the trailing block)",
                            K_feed, nb, k_div,
                        )
                    K_feed = k_div
                k0 = 0
                while k0 < nb:
                    kk = min(max(K_feed, 1), nb - k0)
                    blk = idx_mat[k0 : k0 + kk]
                    rngs_k = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(
                        jnp.arange(global_step, global_step + kk)
                    )
                    dispatch_begin()
                    params, opt_state, loss_state, m = train_steps_feed(
                        params, opt_state, fds_state, loss_state,
                        tr_feats, tr_labels, tr_weights, blk, epoch_f, rngs_k,
                    )
                    dispatch_end(m)
                    accumulate(m, kk)
                    global_step += kk
                    k0 += kk

            pending = []
            pend_sig = None
            for item in [] if feed_on else prefetch_to_device(train_loader, put_on_device):
                if K <= 1:
                    run_single(item)
                    continue
                # lax.scan-fused dispatch needs shape-uniform batches: under
                # pad_mode='bucket' (or ragged debug padding) consecutive
                # batches can land in different width buckets — flush those
                # as single steps instead of crashing jnp.stack
                sig = tuple(sorted((k, v.shape) for k, v in item[0].items()))
                if pending and sig != pend_sig:
                    for it in pending:
                        run_single(it)
                    pending = []
                pend_sig = sig
                pending.append(item)
                if len(pending) == K:
                    feats_k = jax.tree.map(lambda *xs: jnp.stack(xs), *[b[0] for b in pending])
                    labels_k = jnp.stack([b[1] for b in pending])
                    w_k = jnp.stack([b[2] for b in pending])
                    rngs_k = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(
                        jnp.arange(global_step, global_step + K)
                    )
                    dispatch_begin()
                    params, opt_state, loss_state, m = train_steps(
                        params, opt_state, fds_state, loss_state,
                        feats_k, labels_k, w_k, epoch_f, rngs_k,
                    )
                    dispatch_end(m)
                    accumulate(m, K)
                    global_step += K
                    pending = []
            for it in pending:
                run_single(it)
            if profiling and step_timer.times:
                s = step_timer.summary()
                logger.info(
                    "Epoch %d dispatch timing: p50=%.1fms p95=%.1fms over %d dispatches",
                    epoch + 1, s["p50_s"] * 1e3, s["p95_s"] * 1e3, s["steps"],
                )
                step_timer = StepTimer()

            # Per-step metrics were summed on device as they streamed by
            # (_metric_acc); pull one scalar per key and divide by the
            # host-tracked step count.
            train_means = {
                k: float(v) / max(metric_count, 1)
                for k, v in jax.device_get(metric_acc).items()
            }

            # ---- FDS epoch pass: on-device feature sweep + stats update ----
            if self.fds and fds_state is not None and epoch >= fds_start_update:
                if feed_on:
                    # one scan dispatch over the resident train arrays
                    # (same full-batch drop_last order as the loader path)
                    if fds_idx_dev is None:
                        n_full = (
                            len(train_dataset) // self.batch_size
                        ) * self.batch_size
                        fi = np.arange(n_full, dtype=np.int32).reshape(
                            -1, self.batch_size
                        )
                        fds_idx_dev, fds_ns_dev = jax.device_put(
                            (fi, np.full((fi.shape[0],), self.batch_size, np.int32)),
                            replicated(self.mesh),
                        )
                        fds_sweep = self._memo(
                            ("sweep", id(model), id(loss_fn), id(activation_fn), True),
                            (model, loss_fn, activation_fn),
                            lambda: self.build_eval_sweep(
                                model, loss_fn, activation_fn, with_pooled=True
                            ),
                        )
                    _, _, all_feats, all_labels = fds_sweep(
                        params, tr_feats, tr_labels, fds_idx_dev, fds_ns_dev
                    )
                else:
                    if fds_loader is None:
                        fds_loader = CachedLoader(MolDataLoader(
                            train_dataset, self.batch_size, collate_fn,
                            shuffle=False, drop_last=True,
                        ))
                    feats_list, label_list = [], []
                    for batch, labels in fds_loader:
                        fb, _ = self._split_batch(batch)
                        fb, labels_d = jax.device_put(
                            (fb, self._labels_host(labels)), bsh
                        )
                        _, _, pooled, _ = eval_step(
                            params, fb, labels_d,
                            jnp.asarray(labels.shape[0], jnp.int32),
                        )
                        feats_list.append(pooled)
                        label_list.append(jnp.asarray(labels, jnp.float32))
                    all_feats = jnp.concatenate(feats_list, axis=0)
                    all_labels = jnp.concatenate(label_list, axis=0)
                # single compiled program (see fds_epoch_update docstring:
                # eager per-op dispatch can starve the XLA:CPU collective
                # rendezvous on virtual-device meshes and abort the process)
                fds_state = fds_epoch_update(
                    fds_state, all_feats, all_labels,
                    jnp.asarray(epoch, jnp.float32),
                    fds_bucket[0], fds_bucket[1], fds_kernel, model.fds_cfg,
                )
                logger.info("FDS stats updated on device for epoch %d", epoch)

            # ---- validation --------------------------------------------------
            val_t0 = time.time()
            y_preds, val_losses, metric_score = self.predict(
                model, params, valid_dataset, loss_fn, activation_fn,
                dump_dir, fold, target_scaler, collate_fn,
                epoch=epoch, load_model=False, eval_step=eval_step,
                loader=valid_loader, device_data=val_device_data,
            )
            val_seconds = time.time() - val_t0
            total_val_loss = _weighted_loss_mean(val_losses)
            first_metric = next(iter(metric_score)) if metric_score else "loss"
            first_score = metric_score.get(first_metric, float("nan"))
            history.append({
                "epoch": epoch + 1,
                "train_loss": float(train_means["loss"]),
                "m_loss": float(train_means["m_loss"]),
                "infonce_loss": float(train_means["infonce_loss"]),
                "ct_loss": float(train_means["ct_loss"]),
                "val_loss": float(total_val_loss),
                **{f"val_{k}": float(v) for k, v in (metric_score or {}).items()},
                "seconds": round(time.time() - t0, 2),
                # phase split: how much of the epoch went to the validation
                # sweep (the rest is the train loop + metric pull) — keeps
                # host-bound vs device-bound regressions diagnosable from the
                # artifact alone
                "val_seconds": round(val_seconds, 2),
            })
            _write_history(dump_dir, fold, history)
            logger.info(
                "Epoch [%d/%d] train_loss: %.4f, m_loss: %.4f, infonce: %.4f, ct: %.4f, "
                "val_loss: %.4f, val_%s: %.4f, %.1fs",
                epoch + 1, self.max_epochs, train_means["loss"], train_means["m_loss"],
                train_means["infonce_loss"], train_means["ct_loss"],
                total_val_loss, first_metric, first_score, time.time() - t0,
            )

            # ---- early stop + best checkpoint --------------------------------
            # Best weights are kept as a *device* copy; the host+disk
            # serialization happens once after training (device->host pulls
            # of the full param tree are expensive over thin host links).
            improved = False
            if use_metric_stop and self.metrics:
                if self.metrics.is_improvement(first_score, best_score):
                    best_score = first_score
                    improved = True
            else:
                if total_val_loss <= min_val_loss:
                    min_val_loss = total_val_loss
                    improved = True
            if improved:
                wait = 0
                best_params = _copy_tree(params)
                best_fds = _copy_tree(fds_state) if fds_state is not None else None
            else:
                wait += 1
            stopping_early = bool(
                self.stop_after_epoch
                and (epoch + 1) >= self.stop_after_epoch
                and (epoch + 1) < self.max_epochs
            )
            interval_hit = bool(
                self.checkpoint_interval
                and (epoch + 1) % self.checkpoint_interval == 0
            )
            # a stop_after_epoch exit must leave a resumable state even when
            # the periodic interval didn't align with the stop epoch
            if interval_hit or stopping_early:
                early_stop = {
                    "min_val_loss": min_val_loss,
                    "wait": wait,
                    "best_score": float("nan") if best_score is None else best_score,
                }
                if self.async_checkpoint and not stopping_early:
                    # device-side snapshot (ms), then pull+write off-thread.
                    # Copies are required regardless: the live params/opt
                    # buffers are donated into the next dispatch while the
                    # writer still reads them.  best_params is already a
                    # stable copy — the closure pins this epoch's tree even
                    # if a later epoch rebinds the name.
                    snap = (
                        _copy_tree(params), _copy_tree(opt_state),
                        _copy_tree(fds_state) if fds_state is not None else None,
                        _copy_tree(loss_state),
                    )
                    save_fn = partial(
                        save_train_state, dump_dir, fold, snap[0], snap[1],
                        snap[2], epoch, global_step, best_params=best_params,
                        early_stop=early_stop, loss_state=snap[3],
                    )
                    try:
                        ckpt_saver.submit(save_fn)
                    except Exception:
                        # a transient failure of the PREVIOUS save must not
                        # abort training; this epoch's save still runs
                        logger.exception(
                            "previous periodic train-state save failed; "
                            "training continues"
                        )
                        ckpt_saver.submit(save_fn)
                else:
                    # drain any in-flight async save first: it writes the
                    # same artifact (reachable when stop_after_epoch lands
                    # between async interval saves; a no-op otherwise)
                    try:
                        ckpt_saver.wait()
                    except Exception:
                        logger.exception(
                            "previous periodic train-state save failed; "
                            "training continues"
                        )
                    save_train_state(
                        dump_dir, fold, params, opt_state, fds_state, epoch,
                        global_step, best_params=best_params,
                        early_stop=early_stop, loss_state=loss_state,
                    )
            if stopping_early:
                logger.info(
                    "Stopping after epoch %d (stop_after_epoch=%d of %d); "
                    "train state saved — continue with resume=True",
                    epoch + 1, self.stop_after_epoch, self.max_epochs,
                )
                break
            if wait >= self.patience:
                logger.warning("Early stopping at epoch: %d", epoch + 1)
                break

        if trace_state["active"]:  # fewer total dispatches than profile_steps
            jax.profiler.stop_trace()
            logger.info("Profiler trace written to %s", self.profile_dir)

        # in-flight periodic save must land before fit returns its artifacts;
        # a deferred write failure is logged, NOT raised — it must not destroy
        # the final best checkpoint of an otherwise completed run
        try:
            ckpt_saver.wait()
        except Exception:
            logger.exception(
                "periodic train-state save failed; still writing the final "
                "best checkpoint"
            )
        save_checkpoint(dump_dir, fold, best_params, best_fds,
                        backend=self.checkpoint_backend)
        # final predict with best weights (reload from the just-written
        # artifact — validates the checkpoint end-to-end); reuse the compiled
        # eval_step and the cached/collated validation loader instead of
        # paying a second eval trace+compile and re-tokenization.
        # Multi-host: only process 0 wrote the artifact (and a shared FS is
        # not guaranteed), so every process evals the in-memory best_params —
        # bit-identical to the checkpoint (save_checkpoint serializes exactly
        # these arrays).
        if jax.process_count() > 1:
            # skip_metrics=False: preds/losses are replicated for the host
            # pull (_replicate_for_host_pull), so every process computes the
            # identical best-epoch metrics — DCN runs report them like
            # single-host runs do (ADVICE r4); only the checkpoint-RELOAD
            # validation stays skipped (shared FS not guaranteed, documented
            # above).
            y_preds, _, metric_score = self.predict(
                model, best_params, valid_dataset, loss_fn, activation_fn,
                dump_dir, fold, target_scaler, collate_fn, load_model=False,
                eval_step=eval_step, loader=valid_loader,
                device_data=val_device_data,
            )
            if jax.process_index() == 0 and metric_score:
                logger.info(
                    "final best-epoch metrics (multi-host, in-memory params): %s",
                    {k: float(v) for k, v in metric_score.items()},
                )
            return y_preds
        y_preds, _, _ = self.predict(
            model, params, valid_dataset, loss_fn, activation_fn,
            dump_dir, fold, target_scaler, collate_fn, load_model=True,
            eval_step=eval_step, loader=valid_loader,
            device_data=val_device_data,
        )
        return y_preds

    # ------------------------------------------------------------------
    def predict(
        self,
        model,
        params,
        dataset,
        loss_fn,
        activation_fn,
        dump_dir: str,
        fold: int,
        target_scaler=None,
        collate_fn=None,
        epoch: int = 1,
        load_model: bool = False,
        eval_step=None,
        loader=None,
        skip_metrics: bool = False,
        device_data=None,
    ):
        self._register_kernel_mesh()
        if load_model:
            ckpt = load_checkpoint(dump_dir, fold)
            params = self._place_params(ckpt["params"])
            logger.info("load model success!")

        eval_only = load_model or skip_metrics
        if device_data is not None:
            # device-resident sweep (fit's device_feed): ONE scan dispatch
            # over the resident arrays + one batched host pull
            valid_ns = device_data["valid_ns"]
            preds_nb, losses_nb = device_data["eval_sweep"](
                params, device_data["feats"], device_data["labels"],
                device_data["idx"], device_data["valid_ns_dev"],
            )
            if eval_only:
                preds_host = np.asarray(jax.device_get(preds_nb))
                val_losses = []
            else:
                preds_host, loss_host = jax.device_get((preds_nb, losses_nb))
                preds_host = np.asarray(preds_host)
                val_losses = [
                    (float(l), n) for l, n in zip(loss_host, valid_ns)
                ]
            y_preds = np.concatenate(
                [preds_host[i, :n] for i, n in enumerate(valid_ns)]
            )
            # loader order == dataset order (no shuffle): truths are the
            # host label rows as-is
            y_truths = device_data["labels_host"]
        else:
            if eval_step is None:
                eval_step = self._memo(
                    ("eval", id(model), id(loss_fn), id(activation_fn)),
                    (model, loss_fn, activation_fn),
                    lambda: self.build_eval_step(model, loss_fn, activation_fn),
                )
            if loader is None:
                loader = MolDataLoader(
                    dataset, self.batch_size, collate_fn, shuffle=False
                )

            bsh = batch_sharding(self.mesh)
            pred_parts, loss_parts, valid_ns, y_truths = [], [], [], []
            for batch, labels in loader:
                batch, labels, valid_n = self._pad_to_batch(batch, labels)
                feats, _ = self._split_batch(batch)
                feats_d, labels_d = jax.device_put(
                    (feats, self._labels_host(labels)), bsh
                )
                preds, loss, _, _ = eval_step(
                    params, feats_d, labels_d, jnp.asarray(valid_n, jnp.int32),
                )
                pred_parts.append(preds)
                y_truths.append(labels[:valid_n])
                valid_ns.append(valid_n)
                if not eval_only:
                    loss_parts.append(loss)
            # ONE prefetched host pull for the whole sweep (device_get on a
            # pytree issues copy_to_host_async for every leaf before
            # blocking): the old per-batch float(device_get(loss)) paid a
            # round trip per batch and hard-synced it, serializing the eval
            # dispatches.
            preds_list = jax.device_get(pred_parts)
            y_preds = np.concatenate(
                [np.asarray(p)[:n] for p, n in zip(preds_list, valid_ns)]
            )
            y_truths = np.concatenate(y_truths)
            if eval_only:
                val_losses = []
            else:
                # (loss over valid rows, row count) — averaged row-weighted so
                # a padded trailing batch cannot bias early stopping.
                loss_host = jax.device_get(loss_parts)
                val_losses = [(float(l), n) for l, n in zip(loss_host, valid_ns)]

        metric_score = None
        if not eval_only and self.metrics is not None:
            if self.alpha != 0:
                if target_scaler is not None and target_scaler.scaler is not None:
                    inv_p = target_scaler.inverse_transform(y_preds)
                    inv_t = target_scaler.inverse_transform(y_truths)
                    metric_score = self.metrics.cal_metric(
                        inv_t, inv_p, label_cnt=getattr(model, "output_dim", None)
                        if self.task == "multiclass" else None,
                    )
                else:
                    metric_score = self.metrics.cal_metric(
                        y_truths, y_preds, label_cnt=getattr(model, "output_dim", None)
                        if self.task == "multiclass" else None,
                    )
            else:
                metric_score = {"ct_loss": _weighted_loss_mean(val_losses)}
        return y_preds, val_losses, metric_score

    # ------------------------------------------------------------------
    def inference(
        self, model, params, dataset, collate_fn,
        return_atomic_reprs: bool = False, dictionary=None,
    ):
        """Representation extraction (reference Trainer.inference,
        tasks/trainer.py:484-522): CLS-token and pooled reprs per molecule,
        plus — with return_atomic_reprs — per-atom encoder reprs, the centered
        3D coordinates (src_coord minus BOS/EOS rows), and the atom symbols
        decoded through the Dictionary (tasks/trainer.py:508-519)."""
        self._register_kernel_mesh()

        @jax.jit
        def repr_step(p, feats):
            out = model.apply({"params": p}, **feats, deterministic=True)
            return out["cls_repr"], out["pooled"], out["encoder_rep"], out["atom_mask"]

        loader = MolDataLoader(dataset, self.batch_size, collate_fn, shuffle=False)
        params = self._place_params(params)
        result = {
            "cls_repr": [], "pooled_repr": [], "atomic_reprs": [],
            "atomic_coords": [], "atomic_symbol": [],
        }
        offset = 0  # loader is unshuffled: batch rows map to dataset order
        for batch, labels in loader:
            batch, labels, valid_n = self._pad_to_batch(batch, labels)
            feats, _ = self._split_batch(batch)
            cls_r, pooled, enc, mask = jax.device_get(
                repr_step(params, shard_batch(self.mesh, feats))
            )
            result["cls_repr"].extend(list(cls_r[:valid_n]))
            result["pooled_repr"].extend(list(pooled[:valid_n]))
            if return_atomic_reprs:
                for i in range(valid_n):
                    n_valid = int(mask[i].sum())
                    result["atomic_reprs"].append(enc[i, 1 : n_valid - 1])
                    sample = dataset.features[offset + i]
                    if "src_coord" in sample:
                        result["atomic_coords"].append(
                            np.asarray(sample["src_coord"], np.float32)[1:-1]
                        )
                    if dictionary is not None:
                        result["atomic_symbol"].append(
                            [dictionary[int(t)] for t in sample["src_tokens"][1:-1]]
                        )
            offset += valid_n
        return result
