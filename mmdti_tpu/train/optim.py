"""Optimizer + schedule.

Reference: Adam(eps=1e-6, no weight decay) with HF linear warmup->linear decay
over len(train_loader) * max_epochs steps, grad-norm clipping at max_norm
(/root/reference/tasks/trainer.py:158-162,268-277).  TPU: bf16 compute with
fp32 params makes the fp16 GradScaler unnecessary; clipping is always applied
(the reference only clips on its AMP path).
"""

from __future__ import annotations

import optax


def linear_warmup_schedule(learning_rate: float, num_training_steps: int, warmup_ratio: float):
    num_warmup = int(num_training_steps * warmup_ratio)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup)
        decay = (num_training_steps - step) / jnp.maximum(1.0, num_training_steps - num_warmup)
        factor = jnp.where(step < num_warmup, warm, decay)
        return learning_rate * jnp.clip(factor, 0.0, 1.0)

    return schedule


def make_optimizer(
    learning_rate: float,
    num_training_steps: int,
    warmup_ratio: float = 0.03,
    max_norm: float = 5.0,
    eps: float = 1e-6,
    frozen_mask=None,
    mu_dtype: str = "bfloat16",
):
    """frozen_mask: optional pytree of bools (True = frozen) implementing the
    reference's freeze_layers/freeze_module name-prefix freezing
    (/root/reference/models/nnmodel.py:102-132).

    mu_dtype: storage dtype of Adam's first moment (standard
    memory/bandwidth-saving practice — ~0.3GB/step of optimizer traffic at
    flagship scale; the second moment and params stay fp32).  Set
    mu_dtype='float32' for exact fp32 optimizer state."""
    import jax.numpy as jnp

    schedule = linear_warmup_schedule(learning_rate, num_training_steps, warmup_ratio)
    parts = []
    if frozen_mask is not None:
        # Zero frozen-subtree gradients BEFORE clipping so they neither
        # inflate the global clip norm (which would silently scale down the
        # trainable params' updates) nor accumulate Adam moments — matching
        # the reference's requires_grad=False semantics, where frozen params
        # simply produce no gradients (models/nnmodel.py:102-132).
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    parts += [
        optax.clip_by_global_norm(max_norm),
        optax.adam(schedule, eps=eps, mu_dtype=jnp.dtype(mu_dtype)),
    ]
    return optax.chain(*parts), schedule


def make_fused_apply(
    learning_rate: float,
    num_training_steps: int,
    warmup_ratio: float = 0.03,
    max_norm: float = 5.0,
    eps: float = 1e-6,
    frozen_mask=None,
    mu_dtype: str = "bfloat16",
    b1: float = 0.9,
    b2: float = 0.999,
):
    """Fused clip+Adam+apply: ``apply(grads, opt_state, params) ->
    (new_params, new_opt_state)``, bit-identical to running the
    ``make_optimizer`` chain's ``tx.update`` followed by ``p + u`` (asserted
    in tests/test_train.py), on the SAME ``tx.init`` state layout.

    Why: the optax chain materializes the ``updates`` tree (296 MB at
    flagship scale) and the separate ``p + u`` tree.map then re-streams
    params + updates — a measured 2.48 ms/step pure-HBM pass in the round-5
    xprof trace.  Here every leaf's mu/nu/update/apply math lives in ONE
    multi-output tree.map, so XLA emits one fusion per leaf that reads
    (p, g, mu, nu) and writes (p', mu', nu') with no updates tree and no
    second params pass.  The global-norm reduction over grads stays its own
    pass (it must see every grad before any update).  Semantics replicated
    op-for-op from optax clip_by_global_norm / scale_by_adam /
    scale_by_schedule (incl. weak-type promotion of the bf16 mu, bias
    correction on the pre-cast mu, and the schedule's dtype cast).
    """
    import jax
    import jax.numpy as jnp

    mu_dt = jnp.dtype(mu_dtype)
    schedule = linear_warmup_schedule(learning_rate, num_training_steps, warmup_ratio)

    def apply(grads, opt_state, params):
        from optax import ScaleByAdamState, ScaleByScheduleState
        from optax._src import numerics

        sba, sbs = opt_state[-1]  # adam's (ScaleByAdamState, ScaleByScheduleState)
        if frozen_mask is not None:
            grads = jax.tree.map(
                lambda g, f: jnp.zeros_like(g) if f else g, grads, frozen_mask
            )
        g_norm = optax.global_norm(grads)
        trigger = jnp.squeeze(g_norm < max_norm)
        count_inc = numerics.safe_increment(sba.count)
        bc1 = 1 - b1**count_inc
        bc2 = 1 - b2**count_inc
        step_size = -schedule(sbs.count)

        def leaf(p, g, m, v):
            g = jax.lax.select(trigger, g, (g / g_norm.astype(g.dtype)) * max_norm)
            m_new = (1 - b1) * g + b1 * m          # promotes bf16 mu like optax
            v_new = (1 - b2) * (g**2) + b2 * v
            m_hat = m_new / bc1.astype(m_new.dtype)
            v_hat = v_new / bc2.astype(v_new.dtype)
            u = m_hat / (jnp.sqrt(v_hat) + eps)
            u = jnp.array(step_size, dtype=u.dtype) * u
            return p + u, m_new.astype(mu_dt), v_new

        out = jax.tree.map(leaf, params, grads, sba.mu, sba.nu)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        new_p = jax.tree.map(lambda o: o[0], out, is_leaf=is_triple)
        new_m = jax.tree.map(lambda o: o[1], out, is_leaf=is_triple)
        new_v = jax.tree.map(lambda o: o[2], out, is_leaf=is_triple)
        new_adam = (
            ScaleByAdamState(count=count_inc, mu=new_m, nu=new_v),
            ScaleByScheduleState(count=numerics.safe_increment(sbs.count)),
        )
        return new_p, tuple(opt_state[:-1]) + (new_adam,)

    return apply
