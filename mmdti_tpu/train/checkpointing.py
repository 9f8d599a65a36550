"""Checkpointing, mid-training resume, and the per-epoch history artifact.

Split out of trainer.py (round 5; mirrors the round-4 serve_api split).
Three layers:

* best-weights checkpoint (``model_{fold}.ckpt`` / Orbax dir) — the
  MolPredict contract artifact (reference tasks/trainer.py:373-379);
* full train-state checkpointing + trajectory-exact resume — capability the
  reference lacks entirely;
* ``history_{fold}.json`` — the parseable per-epoch scalar log (SURVEY §5).

``CheckpointResumeMixin`` hosts the fit-loop's resume restore and periodic
epoch-state saves; ``Trainer`` composes it (single-writer rule on
multi-host, async background writer, atomic tmp+rename).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np

from mmdti_tpu.utils.logger import logger

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



class CheckpointResumeMixin:
    """Fit-loop checkpoint/resume hooks (state lives on the Trainer)."""

    def _resume_fit_state(self, dump_dir, fold, params, opt_state, fds_state,
                          loss_state, train_loader):
        """Restore a mid-training snapshot when resume is on and one exists.

        Returns (params, opt_state, fds_state, loss_state, start_epoch,
        global_step, resume_extra) — a passthrough with epoch/step 0 and
        resume_extra None otherwise.  Realigns the loader's shuffle stream
        so the resumed trajectory is bit-identical to the uninterrupted run
        (TestResumeE2E)."""
        import jax.numpy as jnp

        from mmdti_tpu.parallel.mesh import replicate

        if not (self.resume and os.path.exists(train_state_path(dump_dir, fold))):
            return params, opt_state, fds_state, loss_state, 0, 0, None
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
        return (params, opt_state, fds_state, loss_state, start_epoch,
                global_step, resume_extra)

    def _save_epoch_state(self, ckpt_saver, dump_dir, fold, epoch, global_step,
                          params, opt_state, fds_state, loss_state,
                          best_params, min_val_loss, wait, best_score):
        """Periodic / stop-requested full train-state save at epoch end.

        Returns ``stopping_early`` (True when stop_after_epoch ends this
        budgeted session).  A stop_after_epoch exit must leave a resumable
        state even when the periodic interval didn't align with the stop
        epoch."""
        from functools import partial

        from mmdti_tpu.train.trainer import _copy_tree

        stopping_early = bool(
            self.stop_after_epoch
            and (epoch + 1) >= self.stop_after_epoch
            and (epoch + 1) < self.max_epochs
        )
        interval_hit = bool(
            self.checkpoint_interval
            and (epoch + 1) % self.checkpoint_interval == 0
        )
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
        return stopping_early
