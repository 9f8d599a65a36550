"""Jit'd step builders + small compiled fit-loop helpers.

Split out of trainer.py (round 5).  ``StepBuilderMixin`` provides the
compiled programs the fit loop dispatches:

* ``build_train_step`` — forward + alpha*task + beta*infonce + beta*ct loss,
  grad, optimizer update (fused clip+Adam+apply or the generic optax chain),
  plus lax.scan K-step and device-feed variants;
* ``build_eval_step`` / ``build_eval_sweep`` — deterministic validation with
  exact padded-row handling, the sweep as ONE scan dispatch over the
  device-resident arrays.

Reference twin: tasks/trainer.py:129-306 (eager per-batch loops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmdti_tpu.losses.contrastive import CT_REGISTRY
from mmdti_tpu.parallel.mesh import batch_sharding

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


def _weighted_loss_mean(val_losses) -> float:
    """Row-weighted mean of per-batch (loss, n_valid_rows) pairs."""
    if not val_losses:
        return 0.0
    total_n = sum(n for _, n in val_losses)
    return float(sum(l * n for l, n in val_losses) / max(total_n, 1))



class StepBuilderMixin:
    """Compiled-program builders (state and config live on the Trainer)."""

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


    def _build_train_bundle(self, model, loss_fn, num_updates, frozen_mask,
                            stateful_loss, use_infonce, use_ct, use_weight,
                            fds_bucket):
        """(tx, train_step, train_steps, train_steps_feed) for one fit:
        the optimizer chain (fused clip+Adam+apply when not accumulating —
        bit-identical under jit; MultiSteps keeps the generic update path
        since its state wraps the chain's) plus the compiled step variants."""
        import optax

        from mmdti_tpu.train.optim import make_fused_apply, make_optimizer

        tx_, _ = make_optimizer(
            self.learning_rate, num_updates, self.warmup_ratio, self.max_norm,
            frozen_mask=frozen_mask, mu_dtype=self.mu_dtype,
        )
        fused_apply = None
        if self.accumulate_steps > 1:
            tx_ = optax.MultiSteps(tx_, every_k_schedule=self.accumulate_steps)
        else:
            fused_apply = make_fused_apply(
                self.learning_rate, num_updates, self.warmup_ratio,
                self.max_norm, frozen_mask=frozen_mask, mu_dtype=self.mu_dtype,
            )
        steps = self.build_train_step(
            model, tx_, loss_fn, use_infonce, use_ct, use_weight, fds_bucket,
            stateful_loss=stateful_loss, fused_apply=fused_apply,
        )
        return (tx_, *steps)
