"""Bidirectional BERT cross-attention fusion (flax).

Capability twin of the live BertCrossEncoder stack
(/root/reference/models/mm_module.py:470-677) and CrossAttentionModel
(/root/reference/models/mm_model.py:379-406): Q from stream-1, K/V from
stream-2, additive -10000 mask over stream-2, post-LN residual blocks with a
GELU FFN; two such encoders run in both directions with dropout on both
streams first.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.configs.architectures import CrossModalConfig
from mmdti_tpu.models.layers import FusedLN, bert_normal_init, get_activation_fn
from mmdti_tpu.ops.attention import masked_attention

_MASK_FILL = -10000.0


class BertCrossAttentionLayer(nn.Module):
    cfg: CrossModalConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, s1, s2, s2_mask_bias, deterministic: bool = True):
        cfg = self.cfg
        B, N1, E = s1.shape
        N2 = s2.shape[1]
        H = cfg.num_attention_heads
        D = E // H

        q_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="query")(s1)
        k_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="key")(s2)
        v_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="value")(s2)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and cfg.attention_probs_dropout_prob > 0)
            else None
        )
        ctx = masked_attention(
            q_tok, k_tok, v_tok, s2_mask_bias, num_heads=H,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=rng, deterministic=deterministic,
            use_pallas=self.use_pallas,
        )

        # self-output block: dense -> dropout -> LN(residual)
        ctx = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="attn_output")(ctx)
        ctx = nn.Dropout(cfg.hidden_dropout_prob)(ctx, deterministic=deterministic)
        attn_out = FusedLN(epsilon=cfg.layer_norm_eps, use_pallas=self.use_pallas,
                           name="attn_LayerNorm")(ctx + s1, out_dtype=self.dtype)

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         kernel_init=bert_normal_init(), name="intermediate")(attn_out)
        inter = get_activation_fn(cfg.hidden_act)(inter)
        out = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return FusedLN(epsilon=cfg.layer_norm_eps, use_pallas=self.use_pallas,
                       name="output_LayerNorm")(out + attn_out, out_dtype=self.dtype)


class BertCrossEncoder(nn.Module):
    cfg: CrossModalConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, s1, s2, s2_mask_bias, deterministic: bool = True):
        x = s1
        for i in range(self.cfg.num_layers):
            x = BertCrossAttentionLayer(self.cfg, dtype=self.dtype,
                                        use_pallas=self.use_pallas,
                                        name=f"layer_{i}")(
                x, s2, s2_mask_bias, deterministic=deterministic
            )
        return x


class CrossAttentionModel(nn.Module):
    """Both directions.  Argument roles follow the reference *call site*
    (models/mm_model.py:571): stream_a = 3D-graph token stream with its mask,
    stream_b = SMILES token stream with its mask.  Returns
    (a_attends_to_b [B,Na,E], b_attends_to_a [B,Nb,E])."""

    cfg: CrossModalConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, stream_a, stream_b, a_mask, b_mask, deterministic: bool = True):
        cfg = self.cfg
        drop = nn.Dropout(cfg.hidden_dropout_prob)
        stream_a = drop(stream_a, deterministic=deterministic)
        stream_b = drop(stream_b, deterministic=deterministic)

        def mask_bias(mask):
            return (1.0 - mask[:, None, None, :].astype(jnp.float32)) * _MASK_FILL

        # stream-b queries attend over stream-a keys (mask on a)
        b_to_a = BertCrossEncoder(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                                  name="graph_attention")(
            stream_b, stream_a, mask_bias(a_mask), deterministic=deterministic
        )
        # stream-a queries attend over stream-b keys (mask on b)
        a_to_b = BertCrossEncoder(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                                  name="text_attention")(
            stream_a, stream_b, mask_bias(b_mask), deterministic=deterministic
        )
        return a_to_b, b_to_a
