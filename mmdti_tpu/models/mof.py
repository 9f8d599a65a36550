"""MOF auxiliary embedding heads (flax).

Capability twins of the reference GasModel / EnvModel
(/root/reference/models/mm_model.py:130-209): gas-id embedding + gas-attribute
MLP concat; pressure/temperature binning + embeddings + joint projection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.models.layers import NonLinearHead, bert_normal_init


class GasModel(nn.Module):
    gas_attr_input_dim: int = 6
    gas_dim: int = 32
    gas_max_count: int = 500
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gas_id: jnp.ndarray, gas_attr: jnp.ndarray) -> jnp.ndarray:
        """gas_id [B] int, gas_attr [B, A] -> [B, 2*gas_dim]."""
        emb = nn.Embed(self.gas_max_count, self.gas_dim, dtype=self.dtype,
                       embedding_init=bert_normal_init(), name="gas_embed")(
            gas_id.astype(jnp.int32)
        )
        attr = NonLinearHead(self.gas_dim, "relu", dtype=self.dtype,
                             name="gas_attr_embed")(gas_attr.astype(self.dtype))
        return jnp.concatenate([emb, attr], axis=-1)


class EnvModel(nn.Module):
    hidden_dim: int = 32
    bins: int = 32
    min_max_key: Dict[str, Tuple[float, float]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pressure: jnp.ndarray, temperature: jnp.ndarray) -> jnp.ndarray:
        """pressure/temperature [B] -> [B, 3*hidden_dim]."""
        mm = self.min_max_key or {"pressure": (0.0, 1.0), "temperature": (0.0, 1.0)}

        def norm(x, key):
            lo, hi = mm[key]
            x = jnp.clip(x.astype(jnp.float32), lo, hi)
            return (x - lo) / max(hi - lo, 1e-12)

        p = norm(pressure, "pressure")
        t = norm(temperature, "temperature")
        proj = NonLinearHead(self.hidden_dim, "relu", dtype=self.dtype, name="project")(
            jnp.stack([p, t], axis=-1).astype(self.dtype)
        )
        p_bin = jnp.clip(jnp.floor(p * self.bins).astype(jnp.int32), 0, self.bins - 1)
        t_bin = jnp.clip(jnp.floor(t * self.bins).astype(jnp.int32), 0, self.bins - 1)
        p_emb = nn.Embed(self.bins, self.hidden_dim, dtype=self.dtype,
                         embedding_init=bert_normal_init(), name="pressure_embed")(p_bin)
        t_emb = nn.Embed(self.bins, self.hidden_dim, dtype=self.dtype,
                         embedding_init=bert_normal_init(), name="temperature_embed")(t_bin)
        return jnp.concatenate([proj, p_emb, t_emb], axis=-1)
