"""Shared flax building blocks."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

ACT2FN = {
    # exact (erf) gelu: matches torch F.gelu's default used by unicore's
    # TransformerEncoderLayer and HF BERT/RoBERTa — flax's default is the
    # tanh approximation, which diverges at the 1e-3 level
    "gelu": lambda x: nn.gelu(x, approximate=False),
    # tanh-approximated gelu: ~2x cheaper on the TPU VPU (erf costs ~4ms/step
    # on the flagship, measured); within 3e-3 of erf and standard practice
    # (GPT-2 et al.).  The Uni-Mol encoder uses this by default as a
    # documented TPU-first deviation; 'gelu' gives exact reference numerics.
    "gelu_tanh": nn.gelu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


def get_activation_fn(name: str) -> Callable:
    if name not in ACT2FN:
        raise ValueError(f"Unknown activation {name}")
    return ACT2FN[name]


def bert_normal_init(stddev: float = 0.02):
    return nn.initializers.normal(stddev=stddev)


class NonLinearHead(nn.Module):
    """Two-layer MLP head (reference: models/mm_model.py:86-128)."""

    out_dim: int
    activation_fn: str = "gelu"
    hidden: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden if self.hidden else x.shape[-1]
        act = get_activation_fn(self.activation_fn)
        x = nn.Dense(hidden, dtype=self.dtype, kernel_init=bert_normal_init(), name="linear1")(x)
        x = act(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=bert_normal_init(), name="linear2")(x)
        return x


class ClassificationHead(nn.Module):
    """dropout -> dense -> act -> dropout -> out_proj
    (reference: models/mm_model.py:44-84)."""

    inner_dim: int
    num_classes: int
    activation_fn: str = "tanh"
    pooler_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation_fn(self.activation_fn)
        x = nn.Dropout(self.pooler_dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.inner_dim, dtype=self.dtype, kernel_init=bert_normal_init(), name="dense")(x)
        x = act(x)
        x = nn.Dropout(self.pooler_dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.num_classes, dtype=self.dtype, kernel_init=bert_normal_init(), name="out_proj")(x)
        return x


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32 regardless of the compute dtype, cast back."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)
        )
        return out.astype(orig)
