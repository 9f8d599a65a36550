"""MOF capability: auxiliary embedding heads + the trainable MOF model (flax).

GasModel / EnvModel are capability twins of the reference heads
(/root/reference/models/mm_model.py:130-209): gas-id embedding +
gas-attribute MLP concat; pressure/temperature binning + embeddings + joint
projection.  MOFModel is the end-to-end wiring the reference only gestures
at: its heads are defined and its MOF collation exists
(models/mm_model.py:619-644), but no trainable forward ever consumes
gas_id/gas_attr (the only consumer, models/encoder.py, cannot even import —
SURVEY §2.2).  Here the wiring is first-class: the same Uni-Mol 3D encoder
runs over the crystal atoms (coords2unimol_mof featurization, chem/mof.py),
its masked-mean pooled representation is concatenated with the gas and
environment embeddings, projected back to the encoder width, optionally
FDS-smoothed, and fed to the task head — so `MolTrain(data_type='mof')`
trains adsorption-style targets end to end.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmdti_tpu.configs.architectures import FDSConfig, UniMolEncoderConfig
from mmdti_tpu.losses.fds import fds_smooth
from mmdti_tpu.models.layers import (
    ClassificationHead,
    NonLinearHead,
    bert_normal_init,
)


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


class MOFModel(nn.Module):
    """Trainable MOF property model: Uni-Mol 3D encoder over the crystal
    atoms + gas/environment embeddings -> projected joint representation ->
    (optional FDS) -> task head.

    Shares the 3D-stream submodule layout with MMModel (unimol_3d_stream:
    embed_tokens / gbf / gbf_proj / encoder), so pretrained Uni-Mol ingestion
    and the fused Pallas kernels apply unchanged.  Returns the same output
    dict surface as MMModel — infonce_loss is a constant 0 (there is no
    SMILES stream to align) so the Trainer's loss plumbing needs no MOF
    branch; `using_infonce` is refused upstream (train/nnmodel.py)."""

    unimol_cfg: UniMolEncoderConfig
    fds_cfg: FDSConfig
    output_dim: int = 1
    atom_vocab_size: int = 35
    atom_pad_idx: int = 1
    task: str = "regression"
    use_fds: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    gas_attr_input_dim: int = 6
    gas_dim: int = 32
    gas_max_count: int = 500
    env_bins: int = 32
    env_min_max: Optional[Dict[str, Tuple[float, float]]] = None

    @nn.compact
    def __call__(
        self,
        src_tokens: jnp.ndarray,                      # [B,N] int atom tokens
        src_distance: Optional[jnp.ndarray] = None,   # [B,N,N] fp32
        src_edge_type: Optional[jnp.ndarray] = None,  # [B,N,N] int
        gas_id: jnp.ndarray = None,                   # [B] int
        gas_attr: jnp.ndarray = None,                 # [B,A] fp32
        pressure: jnp.ndarray = None,                 # [B] fp32
        temperature: jnp.ndarray = None,              # [B] fp32
        deterministic: bool = True,
        fds_state: Optional[Dict[str, jnp.ndarray]] = None,
        net_target: Optional[jnp.ndarray] = None,
        epoch: float = 0.0,
        fds_bucket: Tuple[float, float] = (0.0, 1.0),
        src_coord: Optional[jnp.ndarray] = None,
        **_,
    ) -> Dict[str, Any]:
        from mmdti_tpu.models.mm_model import unimol_3d_stream

        ucfg = self.unimol_cfg
        if gas_id is None or gas_attr is None:
            raise ValueError("MOFModel requires gas_id and gas_attr")
        if pressure is None or temperature is None:
            raise ValueError("MOFModel requires pressure and temperature")

        enc, padding_mask, atom_mask = unimol_3d_stream(
            self, src_tokens, src_distance, src_edge_type, src_coord,
            deterministic, pair_mode="mof",
        )
        encoder_rep = enc["rep"]                              # [B,N,E]

        # masked mean over valid tokens — the molecule path's pooling
        # semantics (MMModel concat-mean) restricted to the single stream
        m = atom_mask[..., None].astype(jnp.float32)
        pooled_atoms = (encoder_rep.astype(jnp.float32) * m).sum(axis=1) / (
            jnp.maximum(m.sum(axis=1), 1.0)
        )                                                     # [B,E] fp32

        gas_repr = GasModel(
            gas_attr_input_dim=self.gas_attr_input_dim, gas_dim=self.gas_dim,
            gas_max_count=self.gas_max_count, dtype=self.dtype,
            name="gas_model",
        )(gas_id, gas_attr)                                   # [B, 2*gas_dim]
        env_repr = EnvModel(
            hidden_dim=self.gas_dim, bins=self.env_bins,
            min_max_key=self.env_min_max, dtype=self.dtype, name="env_model",
        )(pressure, temperature)                              # [B, 3*gas_dim]

        fused = jnp.concatenate(
            [pooled_atoms.astype(self.dtype), gas_repr, env_repr], axis=-1
        )
        # project back to the encoder width so FDS feature_dim and the head
        # match the molecule path's configuration surface
        pooled = NonLinearHead(
            ucfg.embed_dim, ucfg.activation_fn, dtype=self.dtype,
            name="fusion_proj",
        )(fused).astype(jnp.float32)                          # [B,E] fp32

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
            "infonce_loss": jnp.zeros((), jnp.float32),
            "encoder_rep": encoder_rep,
            "cls_repr": encoder_rep[:, 0, :],
            "atom_mask": atom_mask,
            "pair_logits": enc["pair_logits"],
            "x_norm": enc["x_norm"],
            "delta_pair_repr_norm": enc["delta_pair_repr_norm"],
        }


def build_mof_model(
    output_dim: int,
    atom_vocab_size: int,
    atom_pad_idx: int,
    task: str,
    use_fds: bool = False,
    fds_num: int = 20,
    compute_dtype: str = "float32",
    use_pallas: bool = False,
    unimol_overrides: Optional[dict] = None,
    mof_overrides: Optional[dict] = None,
) -> MOFModel:
    """Assemble the MOF model (build_model twin for data_type='mof')."""
    import dataclasses

    ucfg = UniMolEncoderConfig(**(unimol_overrides or {}))
    fcfg = dataclasses.replace(
        FDSConfig(), bucket_num=fds_num, feature_dim=ucfg.embed_dim
    )
    return MOFModel(
        unimol_cfg=ucfg,
        fds_cfg=fcfg,
        output_dim=output_dim,
        atom_vocab_size=atom_vocab_size,
        atom_pad_idx=atom_pad_idx,
        task=task,
        use_fds=use_fds,
        dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        use_pallas=use_pallas,
        **(mof_overrides or {}),
    )
