"""MM-DTI flagship model (flax): multimodal molecular property prediction.

Capability twin of the reference MM_Model (/root/reference/models/mm_model.py:408-618):

  atom tokens --embed--> Uni-Mol encoder biased by Gaussian(distance, edge_type)
  SMILES ids  --------> ChemBERTa (RoBERTa) encoder
  InfoNCE aligns the two pooled projection streams
  bidirectional BERT cross-attention fuses the token streams
  masked concat-mean pooling -> (optional FDS smoothing) -> MLP head

Differences by design (TPU-first):
  * one forward returns a dict (logits, pooled features, InfoNCE loss, reps)
    instead of flag-dependent tuples — the jit'd train step selects what it
    needs and XLA dead-code-eliminates the rest;
  * FDS state is an explicit argument (functional), not module buffers;
  * bf16 compute dtype with fp32 LayerNorm/softmax instead of fp16 AMP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.configs.architectures import (
    ChemBertaConfig,
    CrossModalConfig,
    FDSConfig,
    UniMolEncoderConfig,
)
from mmdti_tpu.losses.fds import fds_smooth
from mmdti_tpu.losses.infonce import InfoNCE
from mmdti_tpu.models.chemberta import ChemBerta
from mmdti_tpu.models.crossmodal import CrossAttentionModel
from mmdti_tpu.models.gaussian import GaussianLayer
from mmdti_tpu.models.layers import ClassificationHead, NonLinearHead, bert_normal_init
from mmdti_tpu.models.unimol import UniMolEncoder


def unimol_3d_stream(mdl: nn.Module, src_tokens, src_distance, src_edge_type,
                     src_coord, deterministic: bool,
                     pair_mode: str = "molecule"):
    """The 3D/conformer stream shared by MMModel and MOFModel: token
    embedding, Gaussian (or numerical) pair bias — fused-Pallas when engaged
    — and the Uni-Mol encoder.  Called from a @nn.compact __call__, so the
    submodules (embed_tokens / gbf / gbf_proj / encoder) attach to the CALLER
    with those exact names: both models share the checkpoint layout of the
    reference encoder (models/mm_model.py:439-463) and pretrained Uni-Mol
    ingestion works unchanged.

    ``mdl`` provides the config surface: unimol_cfg, dtype, use_pallas,
    atom_vocab_size, atom_pad_idx.  Returns (enc dict, padding_mask,
    atom_mask)."""
    ucfg = mdl.unimol_cfg
    if src_distance is None or src_edge_type is None:
        # device-side pair featurization: the input pipeline shipped only
        # tokens + coords (ops/pair_feats.py); reconstruct the [B,N,N]
        # pair tensors here so XLA fuses them into the Gaussian consumer
        if src_coord is None:
            raise ValueError(
                "model needs either (src_distance, src_edge_type) or "
                "src_coord to derive them from"
            )
        from mmdti_tpu.ops.pair_feats import (
            mof_pair_feats_from_coords,
            pair_feats_from_coords,
        )

        feats_fn = (
            mof_pair_feats_from_coords if pair_mode == "mof"
            else pair_feats_from_coords
        )
        src_distance, src_edge_type = feats_fn(
            src_tokens, src_coord, mdl.atom_vocab_size, mdl.atom_pad_idx
        )
    padding_mask = src_tokens == mdl.atom_pad_idx
    atom_mask = (~padding_mask).astype(jnp.int32)

    x = nn.Embed(
        mdl.atom_vocab_size, ucfg.embed_dim, dtype=mdl.dtype,
        embedding_init=bert_normal_init(), name="embed_tokens",
    )(src_tokens)
    N = src_tokens.shape[1]
    fuse_gbf = False
    if mdl.use_pallas and ucfg.kernel == "gaussian":
        from mmdti_tpu.ops.pallas_gbf import gbf_fused_supported

        fuse_gbf = gbf_fused_supported(
            N, ucfg.gaussian_kernels, ucfg.gaussian_kernels,
            ucfg.attention_heads, ucfg.activation_fn,
            batch=src_tokens.shape[0],
        )
    if fuse_gbf:
        # fused Pallas path: Gaussian expansion + gbf_proj MLP in VMEM;
        # [B,N,N,K] never hits HBM.  Kernel emits i-major [B,N,H,N] so
        # the transpose below fuses into the encoder's padding merge.
        from mmdti_tpu.models.gaussian import FusedGbfProj

        u, g_means, g_stds = GaussianLayer(
            kernels=ucfg.gaussian_kernels,
            edge_types=mdl.atom_vocab_size * mdl.atom_vocab_size,
            name="gbf",
        )(src_distance, src_edge_type, tokens=src_tokens, return_affine=True)
        pair = FusedGbfProj(
            out_dim=ucfg.attention_heads,
            kernels=ucfg.gaussian_kernels,
            activation_fn=ucfg.activation_fn,
            dtype=mdl.dtype,
            pair_dtype=jnp.dtype(ucfg.pair_dtype),
            name="gbf_proj",
        )(u, g_means, g_stds)                             # [B,N,H,N]
        bias = jnp.transpose(pair, (0, 2, 1, 3))          # [B,H,N,N]
    else:
        if ucfg.kernel == "gaussian":
            gbf_feat = GaussianLayer(
                kernels=ucfg.gaussian_kernels,
                edge_types=mdl.atom_vocab_size * mdl.atom_vocab_size,
                name="gbf",
            )(src_distance, src_edge_type, tokens=src_tokens)  # [B,N,N,K] fp32
        else:
            from mmdti_tpu.models.gaussian import NumericalEmbed

            gbf_feat = NumericalEmbed(
                kernels=ucfg.gaussian_kernels,
                edge_types=mdl.atom_vocab_size * mdl.atom_vocab_size,
                activation_fn=ucfg.activation_fn,
                name="gbf",
            )(src_distance, src_edge_type)
        bias = NonLinearHead(
            ucfg.attention_heads, ucfg.activation_fn, dtype=mdl.dtype,
            name="gbf_proj",
        )(gbf_feat.astype(mdl.dtype))                    # [B,N,N,H]
        bias = jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.float32)

    enc = UniMolEncoder(
        ucfg, dtype=mdl.dtype, use_pallas=mdl.use_pallas, name="encoder"
    )(x, bias, padding_mask, deterministic=deterministic)
    return enc, padding_mask, atom_mask


class MMModel(nn.Module):
    unimol_cfg: UniMolEncoderConfig
    chemberta_cfg: ChemBertaConfig
    cross_cfg: CrossModalConfig
    fds_cfg: FDSConfig
    output_dim: int = 1
    atom_vocab_size: int = 35
    atom_pad_idx: int = 1
    task: str = "regression"
    use_fds: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        src_tokens: jnp.ndarray,       # [B,N] int atom tokens
        src_distance: Optional[jnp.ndarray] = None,   # [B,N,N] fp32
        src_edge_type: Optional[jnp.ndarray] = None,  # [B,N,N] int
        input_ids: jnp.ndarray = None,                # [B,L] int SMILES tokens
        attention_mask: jnp.ndarray = None,           # [B,L] {0,1}
        deterministic: bool = True,
        fds_state: Optional[Dict[str, jnp.ndarray]] = None,
        net_target: Optional[jnp.ndarray] = None,
        epoch: float = 0.0,
        fds_bucket: Tuple[float, float] = (0.0, 1.0),
        src_coord: Optional[jnp.ndarray] = None,      # [B,N,3] fp32
        **_,
    ) -> Dict[str, Any]:
        ucfg = self.unimol_cfg
        if input_ids is None or attention_mask is None:
            # these only became keyword-optional so src_distance/src_edge_type
            # could move behind src_coord; fail here by name instead of
            # opaquely inside the ChemBERTa trace
            raise ValueError("MMModel requires input_ids and attention_mask")

        # --- 3D stream -------------------------------------------------------
        enc, padding_mask, atom_mask = unimol_3d_stream(
            self, src_tokens, src_distance, src_edge_type, src_coord,
            deterministic,
        )
        encoder_rep = enc["rep"]                              # [B,N,E]

        # --- SMILES stream ---------------------------------------------------
        bert_rep = ChemBerta(self.chemberta_cfg, dtype=self.dtype,
                             use_pallas=self.use_pallas, name="bert")(
            input_ids, attention_mask, deterministic=deterministic
        )                                                     # [B,L,E]

        # --- cross-modal alignment (InfoNCE) ----------------------------------
        infonce_loss = InfoNCE(dtype=self.dtype, name="infonce")(
            encoder_rep, bert_rep, deterministic=deterministic
        )

        # --- fusion ------------------------------------------------------------
        a_to_b, b_to_a = CrossAttentionModel(self.cross_cfg, dtype=self.dtype,
                                             use_pallas=self.use_pallas,
                                             name="cross_modal_module")(
            encoder_rep, bert_rep, atom_mask, attention_mask,
            deterministic=deterministic,
        )
        a_to_b = a_to_b * atom_mask[..., None].astype(a_to_b.dtype)
        b_to_a = b_to_a * attention_mask[..., None].astype(b_to_a.dtype)
        fused = jnp.concatenate([a_to_b, b_to_a], axis=1)     # [B, N+L, E]
        denom = (
            atom_mask.sum(axis=1, keepdims=True) + attention_mask.sum(axis=1, keepdims=True)
        ).astype(jnp.float32)
        pooled = fused.sum(axis=1).astype(jnp.float32) / denom  # [B,E] fp32

        # --- FDS smoothing (train-time, regression) ----------------------------
        head_in = pooled
        if (
            self.use_fds
            and self.task == "regression"
            and fds_state is not None
            and net_target is not None
            and not deterministic
        ):
            head_in = fds_smooth(
                fds_state, pooled, net_target, epoch,
                fds_bucket[0], fds_bucket[1], self.fds_cfg,
            )

        logits = ClassificationHead(
            inner_dim=ucfg.embed_dim,
            num_classes=self.output_dim,
            activation_fn=ucfg.pooler_activation_fn,
            pooler_dropout=ucfg.pooler_dropout,
            dtype=self.dtype,
            name="classification_head",
        )(head_in.astype(self.dtype), deterministic=deterministic)

        return {
            "logits": logits.astype(jnp.float32),
            "pooled": pooled,                        # pre-smoothing (CT input)
            "infonce_loss": infonce_loss,
            "encoder_rep": encoder_rep,
            "bert_rep": bert_rep,
            "cls_repr": encoder_rep[:, 0, :],
            "atom_mask": atom_mask,
            "pair_logits": enc["pair_logits"],
            "x_norm": enc["x_norm"],
            "delta_pair_repr_norm": enc["delta_pair_repr_norm"],
        }


def build_model(
    output_dim: int,
    atom_vocab_size: int,
    atom_pad_idx: int,
    task: str,
    smiles_vocab_size: int,
    use_fds: bool = False,
    fds_num: int = 20,
    compute_dtype: str = "float32",
    use_pallas: bool = False,
    unimol_overrides: Optional[dict] = None,
    chemberta_overrides: Optional[dict] = None,
    crossmodal_overrides: Optional[dict] = None,
) -> MMModel:
    """Assemble the flagship model from task-level options."""
    import dataclasses

    # pair_dtype: NNModel/'auto' sets 'bfloat16' on the TPU Pallas path (the
    # kernels store the threaded logits chain in bf16 while computing fp32 in
    # VMEM — half the chain's HBM traffic); fp32 stays the dataclass default
    # so the XLA oracle path and CPU tests keep exact numerics.
    ucfg = UniMolEncoderConfig(**(unimol_overrides or {}))
    # dict-merge (not a positional kwarg) so overrides carrying vocab_size —
    # e.g. fields copied from an HF config.json — replace instead of raising
    # "multiple values for keyword argument"
    ccfg = ChemBertaConfig(
        **{"vocab_size": smiles_vocab_size, **(chemberta_overrides or {})}
    )
    # fusion stack is configurable here (the reference hardcodes
    # crossmodal_config(), models/mm_model.py:362-377); hidden_size tracks
    # the encoder embed_dim unless explicitly overridden
    xcfg = CrossModalConfig(
        **{"hidden_size": ucfg.embed_dim, **(crossmodal_overrides or {})}
    )
    fcfg = dataclasses.replace(FDSConfig(), bucket_num=fds_num, feature_dim=ucfg.embed_dim)
    return MMModel(
        unimol_cfg=ucfg,
        chemberta_cfg=ccfg,
        cross_cfg=xcfg,
        fds_cfg=fcfg,
        output_dim=output_dim,
        atom_vocab_size=atom_vocab_size,
        atom_pad_idx=atom_pad_idx,
        task=task,
        use_fds=use_fds,
        dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        use_pallas=use_pallas,
    )
