"""InfoNCE cross-modal alignment loss (flax module + pure loss fn).

Capability twin of /root/reference/models/infonce.py: dropout on the query
stream, per-modality 2-layer GELU MLP projections (E -> E -> 50), mean-pool
over the token axis (all positions, matching the reference), unit-normalize,
in-batch similarity matrix with diagonal positives, symmetric cross-entropy
averaged over both directions at temperature 0.1.

Under pjit data parallelism the similarity matrix is computed on the *global*
batch (XLA inserts the all-gather), preserving the reference's global-batch
negative semantics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

def bert_normal_init(stddev: float = 0.02):
    """Same factory as models.layers.bert_normal_init (importing it here
    would cycle: models -> losses.infonce -> models)."""
    return nn.initializers.normal(stddev=stddev)


def info_nce_loss(query: jnp.ndarray, positive: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """query/positive: [B, D] pooled projections."""
    q = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-12)
    p = positive / (jnp.linalg.norm(positive, axis=-1, keepdims=True) + 1e-12)
    logits = jnp.einsum("id,jd->ij", q, p, preferred_element_type=jnp.float32)
    labels = jnp.arange(logits.shape[0])

    def ce(lg):
        return -jnp.take_along_axis(
            jax.nn.log_softmax(lg / temperature, axis=-1), labels[:, None], axis=1
        ).mean()

    return (ce(logits) + ce(logits.T)) / 2.0


class InfoNCE(nn.Module):
    proj_dim: int = 50
    temperature: float = 0.1
    embed_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_tokens, positive_tokens, deterministic: bool = True):
        """query_tokens [B,N,E] (3D-graph stream), positive_tokens [B,L,E]
        (SMILES stream) -> scalar loss."""
        E = query_tokens.shape[-1]
        q = nn.Dropout(self.embed_dropout)(query_tokens, deterministic=deterministic)

        def mlp(x, name):
            x = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(stddev=0.02),
                         name=f"{name}_fc1")(x)
            x = nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)
            return nn.Dense(self.proj_dim, dtype=self.dtype, kernel_init=bert_normal_init(stddev=0.02),
                            name=f"{name}_fc2")(x)

        proj_q = mlp(q, "proj_query").mean(axis=1).astype(jnp.float32)
        proj_p = mlp(positive_tokens, "proj_positive").mean(axis=1).astype(jnp.float32)
        return info_nce_loss(proj_q, proj_p, self.temperature)
