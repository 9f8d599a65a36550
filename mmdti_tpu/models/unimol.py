"""Uni-Mol-style 3D conformer transformer encoder (flax).

Capability twin of the reference TransformerEncoderWithPair + unicore
TransformerEncoderLayer stack (/root/reference/models/transformers.py:14-183):
embedding LayerNorm + dropout, padding merged into the per-head attention bias
with -inf, N pre-LN layers each consuming the incoming pair bias and emitting
its pre-softmax logits as the outgoing bias, final LayerNorm, token/pair norm
losses, and delta-pair representation (final bias minus input bias).

TPU design notes: softmax/logits accumulate in fp32 while matmuls run in the
configured compute dtype (bf16 on the MXU); the attention inner op is
swappable between the XLA oracle and the fused Pallas kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.configs.architectures import UniMolEncoderConfig
from mmdti_tpu.models.layers import LayerNormFP32, bert_normal_init, get_activation_fn
from mmdti_tpu.ops.attention import merge_padding_into_bias, pair_bias_attention


class PairBiasEncoderLayer(nn.Module):
    cfg: UniMolEncoderConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        """x [B,N,E], bias [B,H,N,N] fp32 -> (x', new_bias)."""
        cfg = self.cfg
        B, N, E = x.shape
        H, D = cfg.attention_heads, cfg.head_dim

        residual = x
        x = LayerNormFP32(name="self_attn_layer_norm", use_pallas=self.use_pallas)(x)
        qkv = nn.Dense(3 * E, dtype=self.dtype, kernel_init=bert_normal_init(), name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        rng = self.make_rng("dropout") if (not deterministic and cfg.attention_dropout > 0) else None
        pair_dtype = jnp.dtype(cfg.pair_dtype)
        attn, new_bias = pair_bias_attention(
            q, k, v, bias, num_heads=H,
            dropout_rate=cfg.attention_dropout,
            dropout_rng=rng, deterministic=deterministic,
            pair_dtype=pair_dtype, use_pallas=self.use_pallas,
        )
        attn = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="out_proj")(attn)
        x = residual + nn.Dropout(cfg.dropout)(attn, deterministic=deterministic)

        residual = x
        x = LayerNormFP32(name="final_layer_norm", use_pallas=self.use_pallas)(x)
        x = nn.Dense(cfg.ffn_embed_dim, dtype=self.dtype, kernel_init=bert_normal_init(), name="fc1")(x)
        x = get_activation_fn(cfg.activation_fn)(x)
        x = nn.Dropout(cfg.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(E, dtype=self.dtype, kernel_init=bert_normal_init(), name="fc2")(x)
        x = residual + nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return x, new_bias


def _norm_loss(x, eps=1e-10, tolerance=1.0):
    x = x.astype(jnp.float32)
    max_norm = x.shape[-1] ** 0.5
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1) + eps)
    return nn.relu(jnp.abs(norm - max_norm) - tolerance)


def _masked_mean(mask, value, axis=-1, eps=1e-10):
    return (jnp.sum(mask * value, axis=axis) / (eps + jnp.sum(mask, axis=axis))).mean()


class UniMolEncoder(nn.Module):
    cfg: UniMolEncoderConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        emb: jnp.ndarray,                      # [B,N,E]
        attn_bias: jnp.ndarray,                # [B,H,N,N] fp32 pair bias
        padding_mask: Optional[jnp.ndarray],   # [B,N] bool, True at pads
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        x = LayerNormFP32(name="emb_layer_norm", use_pallas=self.use_pallas)(emb)
        x = nn.Dropout(cfg.emb_dropout)(x, deterministic=deterministic)
        if padding_mask is not None:
            x = x * (1.0 - padding_mask[..., None].astype(x.dtype))

        pair_dtype = jnp.dtype(cfg.pair_dtype)
        input_bias = attn_bias.astype(pair_dtype)
        bias = merge_padding_into_bias(input_bias, padding_mask, pair_dtype=pair_dtype)
        layer_cls = (
            nn.remat(PairBiasEncoderLayer, static_argnums=(3,))
            if cfg.remat
            else PairBiasEncoderLayer
        )
        for i in range(cfg.encoder_layers):
            x, bias = layer_cls(
                cfg, dtype=self.dtype, use_pallas=self.use_pallas, name=f"layers_{i}"
            )(x, bias, deterministic)

        token_norm = _norm_loss(x)
        if padding_mask is not None:
            token_mask = 1.0 - padding_mask.astype(jnp.float32)
        else:
            token_mask = jnp.ones_like(token_norm)
        x_norm = _masked_mean(token_mask, token_norm)

        if not cfg.post_ln:
            x = LayerNormFP32(name="final_layer_norm", use_pallas=self.use_pallas)(x)

        # delta pair representation: accumulated logits minus the (unfilled)
        # input bias, zeroed at padded keys, [B,N,N,H]
        # (reference: models/transformers.py:163-164)
        delta = bias.astype(jnp.float32) - input_bias.astype(jnp.float32)
        if padding_mask is not None:
            delta = jnp.where(padding_mask[:, None, None, :], 0.0, delta)
        delta_pair = jnp.transpose(delta, (0, 2, 3, 1))
        pair_mask = token_mask[..., None] * token_mask[..., None, :]
        delta_norm = _masked_mean(pair_mask, _norm_loss(delta_pair), axis=(-1, -2))

        if cfg.delta_pair_repr_norm_loss >= 0:
            delta_pair = LayerNormFP32(name="final_head_layer_norm", use_pallas=self.use_pallas)(delta_pair)

        return {
            "rep": x,                                  # [B,N,E]
            "pair_logits": bias,                       # [B,H,N,N] fp32
            "delta_pair_repr": delta_pair,             # [B,N,N,H]
            "x_norm": x_norm,
            "delta_pair_repr_norm": delta_norm,
        }
