"""ChemBERTa: RoBERTa-style SMILES transformer in flax.

The reference loads an HF checkpoint with AutoModel
(/root/reference/models/mm_model.py:475-476) and uses its last_hidden_state.
This is an HF-numerics-compatible flax implementation (RoBERTa position-id
offset from the pad token, post-LN BERT blocks, fp32 LayerNorm/softmax) so
that HF ChemBERTa torch checkpoints convert directly
(mmdti_tpu.models.convert.convert_hf_roberta); without a checkpoint it trains
from scratch on the built-in SMILES tokenizer vocabulary.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.configs.architectures import ChemBertaConfig
from mmdti_tpu.models.layers import FusedLN, bert_normal_init, get_activation_fn
from mmdti_tpu.ops.attention import masked_attention


def roberta_position_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """HF create_position_ids_from_input_ids: cumulative count of non-pad
    tokens, offset by padding_idx; pads keep padding_idx."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


class RobertaEmbeddings(nn.Module):
    cfg: ChemBertaConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.cfg
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        embedding_init=bert_normal_init(), name="word_embeddings")(input_ids)
        pos_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                       embedding_init=bert_normal_init(), name="position_embeddings")(pos_ids)
        tt = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                      embedding_init=bert_normal_init(), name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = word + pos + tt
        x = FusedLN(epsilon=cfg.layer_norm_eps, use_pallas=self.use_pallas,
                    name="LayerNorm")(x, out_dtype=self.dtype)
        return nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)


class RobertaLayer(nn.Module):
    cfg: ChemBertaConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask_bias, deterministic: bool = True):
        cfg = self.cfg
        B, L, E = x.shape
        H = cfg.num_attention_heads
        D = E // H

        q_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="attn_query")(x)
        k_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="attn_key")(x)
        v_tok = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="attn_value")(x)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and cfg.attention_probs_dropout_prob > 0)
            else None
        )
        ctx = masked_attention(
            q_tok, k_tok, v_tok, mask_bias, num_heads=H,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=rng, deterministic=deterministic,
            use_pallas=self.use_pallas,
        )
        ctx = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="attn_output")(ctx)
        ctx = nn.Dropout(cfg.hidden_dropout_prob)(ctx, deterministic=deterministic)
        x = FusedLN(epsilon=cfg.layer_norm_eps, use_pallas=self.use_pallas,
                    name="attn_LayerNorm")(ctx + x, out_dtype=self.dtype)

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         kernel_init=bert_normal_init(), name="intermediate")(x)
        inter = get_activation_fn(cfg.hidden_act)(inter)
        out = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        x = FusedLN(epsilon=cfg.layer_norm_eps, use_pallas=self.use_pallas,
                    name="output_LayerNorm")(out + x, out_dtype=self.dtype)
        return x


class ChemBerta(nn.Module):
    cfg: ChemBertaConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,          # [B,L] int
        attention_mask: jnp.ndarray,     # [B,L] {0,1}
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        x = RobertaEmbeddings(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                              name="embeddings")(
            input_ids, deterministic=deterministic
        )
        # HF extended mask: (1-mask) * large negative, broadcast over heads/queries
        neg = jnp.finfo(jnp.float32).min
        mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg
        for i in range(cfg.num_hidden_layers):
            x = RobertaLayer(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                             name=f"layer_{i}")(
                x, mask_bias, deterministic=deterministic
            )
        return x  # last_hidden_state [B,L,E]
