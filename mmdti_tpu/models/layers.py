"""Shared flax building blocks."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
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


class FusedLN(nn.Module):
    """LayerNorm with fp32 stats/affine and an optional fused Pallas path.

    The param tree matches ``nn.LayerNorm`` (scale/bias at this module's
    scope), so checkpoints and the HF/unicore converters are unaffected.
    The XLA path reproduces ``flax.linen.LayerNorm(dtype=float32)`` math
    exactly (fast variance with the negative-roundoff clamp, epsilon inside
    the rsqrt); the Pallas path additionally recomputes the per-token stats
    in the backward so the [T] mean/rstd tensors are never saved to HBM.
    Chip-measured NEUTRAL on the flagship (ops/pallas_ln.py docstring), so
    the kernel is opt-in via MMDTI_PALLAS_LN=1 and the default is the XLA
    branch regardless of ``use_pallas``.
    """

    epsilon: float = 1e-5
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, out_dtype=None):
        E = x.shape[-1]
        od = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
        scale = self.param("scale", nn.initializers.ones, (E,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (E,), jnp.float32)
        from mmdti_tpu.ops.pallas_ln import layer_norm_fused, ln_kernel_enabled

        if ln_kernel_enabled(self.use_pallas, x.shape):
            return layer_norm_fused(
                x, scale, bias, epsilon=self.epsilon, out_dtype=od
            )
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(od)


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32 regardless of the compute dtype, cast back."""

    epsilon: float = 1e-5
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        return FusedLN(epsilon=self.epsilon, use_pallas=self.use_pallas,
                       name="ln")(x, out_dtype=x.dtype)
