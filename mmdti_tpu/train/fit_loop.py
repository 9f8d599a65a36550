"""The fit loop: epochs of jit'd train dispatches, FDS pass, validation,
early stopping, best-checkpoint tracking, and the final predict.

Split out of trainer.py (round 5; the VERDICT r4 monolith item).  State and
config live on the Trainer; the compiled programs come from
StepBuilderMixin, the resident input feed from DeviceFeedMixin, and the
resume/periodic-save hooks from CheckpointResumeMixin.

Reference twin: tasks/trainer.py:29-379 (fit_predict), re-designed around
single-compile static-shape steps, device-resident metrics accumulation,
and epoch-sized scan dispatches.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from mmdti_tpu.data.batching import CachedLoader, MolDataLoader
from mmdti_tpu.data.pipeline import prefetch_to_device
from mmdti_tpu.losses.fds import fds_epoch_update
from mmdti_tpu.parallel.mesh import batch_sharding, replicate, replicated
from mmdti_tpu.train.checkpointing import (
    _AsyncSaver,
    _load_history,
    _write_history,
    save_checkpoint,
)
from mmdti_tpu.train.profiler import DispatchProfiler
from mmdti_tpu.train.steps import (
    _copy_tree,
    _metric_acc,
    _metric_sums,
    _weighted_loss_mean,
)
from mmdti_tpu.utils.logger import logger


class FitLoopMixin:
    """fit_predict and nothing else (the epoch loop is one coherent unit)."""

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
            return self._build_train_bundle(
                model, loss_fn, num_updates, frozen_mask, stateful_loss,
                use_infonce, use_ct, use_weight, fds_bucket,
            )

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

        (params, opt_state, fds_state, loss_state, start_epoch, global_step,
         resume_extra) = self._resume_fit_state(
            dump_dir, fold, params, opt_state, fds_state, loss_state,
            train_loader,
        )

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
            return self._put_batch_on_device(bsh, item)

        # profiling hooks (train/profiler.py DispatchProfiler): trace the
        # first profile_steps dispatches + per-epoch p50/p95; no-ops when off
        prof = DispatchProfiler(self.profile_dir, self.profile_steps)

        def dispatch_begin():
            prof.begin(epoch == start_epoch)

        def dispatch_end(result):
            prof.end(result)

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
                K_feed = K if (self.steps_per_call_explicit or prof.enabled) else nb
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
            prof.epoch_summary(epoch)

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
            stopping_early = self._save_epoch_state(
                ckpt_saver, dump_dir, fold, epoch, global_step, params,
                opt_state, fds_state, loss_state, best_params, min_val_loss,
                wait, best_score,
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

        prof.close()

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

