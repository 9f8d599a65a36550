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
