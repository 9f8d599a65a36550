"""Full-MMModel forward oracle (VERDICT r2 next-round #1, final piece).

Composes hand-ported torch oracles of every reference stage —
embedding + Gaussian pair bias (/root/reference/models/mm_model.py:540-560),
the pre-LN pair-bias encoder stack (models/transformers.py:96-183), HF
RobertaModel for the SMILES stream (mm_model.py:475), the InfoNCE module
(models/infonce.py:20-38), the bidirectional cross-modal fusion + call-site
pooling (mm_model.py:571-576), and the classification head (mm_model.py:44-84)
— and checks the flax MMModel forward reproduces all of it end-to-end at fp32
tolerance from shared weights.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_models import _torch_linear, _tt, torch_cross_modal  # noqa: E402

from mmdti_tpu.configs.architectures import (  # noqa: E402
    ChemBertaConfig,
    CrossModalConfig,
    FDSConfig,
    UniMolEncoderConfig,
)
from mmdti_tpu.models.mm_model import MMModel  # noqa: E402

E, H, LAYERS, FFN, K = 32, 4, 2, 64, 8
ATOM_VOCAB, PAD_IDX = 16, 0
BERT_LAYERS, BERT_HEADS = 1, 2
B, N, L = 2, 6, 9


def _configs():
    ucfg = UniMolEncoderConfig(
        encoder_layers=LAYERS, embed_dim=E, ffn_embed_dim=FFN, attention_heads=H,
        dropout=0.0, emb_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pooler_dropout=0.0, activation_fn="gelu", gaussian_kernels=K,
    )
    ccfg = ChemBertaConfig(
        vocab_size=50, hidden_size=E, num_hidden_layers=BERT_LAYERS,
        num_attention_heads=BERT_HEADS, intermediate_size=FFN,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5,
    )
    xcfg = CrossModalConfig(
        hidden_size=E, num_attention_heads=H, intermediate_size=FFN,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return ucfg, ccfg, xcfg


def _inputs():
    rng = np.random.RandomState(17)
    src_tokens = rng.randint(3, ATOM_VOCAB, size=(B, N)).astype(np.int32)
    src_tokens[1, -2:] = PAD_IDX  # second molecule has 2 padded atoms
    dist = np.abs(rng.randn(B, N, N)).astype(np.float32)
    dist = dist + dist.transpose(0, 2, 1)
    edge_type = src_tokens[:, :, None] * ATOM_VOCAB + src_tokens[:, None, :]
    ids = np.full((B, L), 1, np.int32)  # HF pad token 1
    ids[0, :6] = [0, 5, 6, 7, 8, 2]
    ids[1, :4] = [0, 9, 10, 2]
    mask = (ids != 1).astype(np.int32)
    return src_tokens, dist, edge_type, ids, mask


def _torch_enc_layer(x, bias, lp):
    """Reference pre-LN encoder layer (same port as TestTorchOracleEncoderParity)."""
    Bx, Nx, Ex = x.shape
    D = Ex // H
    residual = x
    x = F.layer_norm(
        x, (Ex,), _tt(lp["self_attn_layer_norm"]["ln"]["scale"]),
        _tt(lp["self_attn_layer_norm"]["ln"]["bias"]), eps=1e-5,
    )
    qkv = _torch_linear(x, lp["in_proj"])
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(t):
        return t.view(Bx, Nx, H, D).transpose(1, 2)

    logits = heads(q) * D ** -0.5 @ heads(k).transpose(-1, -2) + bias
    o = (torch.softmax(logits, -1) @ heads(v)).transpose(1, 2).reshape(Bx, Nx, Ex)
    x = residual + _torch_linear(o, lp["out_proj"])
    residual = x
    x = F.layer_norm(
        x, (Ex,), _tt(lp["final_layer_norm"]["ln"]["scale"]),
        _tt(lp["final_layer_norm"]["ln"]["bias"]), eps=1e-5,
    )
    x = F.gelu(_torch_linear(x, lp["fc1"]))
    x = _torch_linear(x, lp["fc2"])
    return residual + x, logits


class TestFullModelOracle:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import RobertaConfig, RobertaModel

        from mmdti_tpu.models.convert import convert_hf_roberta

        ucfg, ccfg, xcfg = _configs()
        model = MMModel(
            unimol_cfg=ucfg, chemberta_cfg=ccfg, cross_cfg=xcfg,
            fds_cfg=FDSConfig(feature_dim=E), output_dim=3,
            atom_vocab_size=ATOM_VOCAB, atom_pad_idx=PAD_IDX, task="regression",
        )
        src_tokens, dist, edge_type, ids, mask = _inputs()
        batch = dict(
            src_tokens=jnp.asarray(src_tokens), src_distance=jnp.asarray(dist),
            src_edge_type=jnp.asarray(edge_type), input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        )
        rng = jax.random.PRNGKey(3)
        params = jax.tree.map(
            np.asarray,
            model.init({"params": rng, "dropout": rng}, **batch, deterministic=True)[
                "params"
            ],
        )
        # SMILES stream weights come from a real HF RobertaModel so the torch
        # side of the oracle can be HF itself (parity of the flax ChemBerta
        # against HF is separately proven in TestChemBertaHFParity)
        hf_cfg = RobertaConfig(
            vocab_size=50, hidden_size=E, num_hidden_layers=BERT_LAYERS,
            num_attention_heads=BERT_HEADS, intermediate_size=FFN,
            max_position_embeddings=40, type_vocab_size=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            pad_token_id=1, layer_norm_eps=1e-5,
        )
        torch.manual_seed(0)
        hf = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
        params["bert"] = convert_hf_roberta(hf.state_dict(), params["bert"])

        got = model.apply(
            {"params": params}, **batch, deterministic=True
        )
        return params, hf, got, (src_tokens, dist, edge_type, ids, mask)

    def _torch_forward(self, p, hf, inputs):
        src_tokens, dist, edge_type, ids, mask = inputs
        pad = src_tokens == PAD_IDX
        atom_mask = (~pad).astype(np.float32)

        # --- 3D stream ---------------------------------------------------
        emb = _tt(p["embed_tokens"]["embedding"])[torch.from_numpy(src_tokens.astype(np.int64))]
        gm = _tt(p["gbf"]["mul"])[torch.from_numpy(edge_type.astype(np.int64))]
        gb = _tt(p["gbf"]["bias"])[torch.from_numpy(edge_type.astype(np.int64))]
        u = gm * _tt(dist).unsqueeze(-1) + gb                     # [B,N,N,1]
        std = _tt(p["gbf"]["stds"]).abs() + 1e-5
        mean = _tt(p["gbf"]["means"])
        feat = torch.exp(-0.5 * ((u - mean) / std) ** 2) / (
            math.sqrt(2 * 3.14159) * std
        )                                                         # [B,N,N,K]
        hfeat = F.gelu(_torch_linear(feat, p["gbf_proj"]["linear1"]))
        bias = _torch_linear(hfeat, p["gbf_proj"]["linear2"])     # [B,N,N,H]
        bias = bias.permute(0, 3, 1, 2)
        bias = bias.masked_fill(_tt(pad.astype(np.float32))[:, None, None, :].bool(), float("-inf"))

        tx = F.layer_norm(
            emb, (E,), _tt(p["encoder"]["emb_layer_norm"]["ln"]["scale"]),
            _tt(p["encoder"]["emb_layer_norm"]["ln"]["bias"]), eps=1e-5,
        )
        tx = tx * _tt(atom_mask).unsqueeze(-1)
        for i in range(LAYERS):
            tx, bias = _torch_enc_layer(tx, bias, p["encoder"][f"layers_{i}"])
        encoder_rep = F.layer_norm(
            tx, (E,), _tt(p["encoder"]["final_layer_norm"]["ln"]["scale"]),
            _tt(p["encoder"]["final_layer_norm"]["ln"]["bias"]), eps=1e-5,
        )

        # --- SMILES stream -----------------------------------------------
        out_bert = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state

        # --- InfoNCE ------------------------------------------------------
        def mlp(x, name):
            x = _torch_linear(x, p["infonce"][f"{name}_fc1"])
            return _torch_linear(F.gelu(x), p["infonce"][f"{name}_fc2"])

        proj_q = mlp(encoder_rep, "proj_query").mean(dim=1)
        proj_p = mlp(out_bert, "proj_positive").mean(dim=1)
        qn, pn = F.normalize(proj_q, dim=-1), F.normalize(proj_p, dim=-1)
        sim = qn @ pn.T
        labels = torch.arange(B)
        infonce = (
            F.cross_entropy(sim / 0.1, labels) + F.cross_entropy(sim.T / 0.1, labels)
        ) / 2

        # --- fusion + pooling (mm_model.py:571-576) ----------------------
        a_to_b, b_to_a = torch_cross_modal(
            encoder_rep, out_bert, atom_mask, mask.astype(np.float32),
            p["cross_modal_module"], H=H, num_layers=1, eps=1e-12,
        )
        a_to_b = a_to_b.clone()
        b_to_a = b_to_a.clone()
        a_to_b[~_tt(atom_mask).bool()] = 0.0
        b_to_a[~torch.from_numpy(mask.astype(bool))] = 0.0
        fused = torch.cat((a_to_b, b_to_a), dim=1)
        pooled = fused.sum(dim=1) / (
            _tt(atom_mask).sum(1).view(-1, 1) + _tt(mask.astype(np.float32)).sum(1).view(-1, 1)
        )

        # --- head ---------------------------------------------------------
        x = torch.tanh(_torch_linear(pooled, p["classification_head"]["dense"]))
        logits = _torch_linear(x, p["classification_head"]["out_proj"])
        return dict(
            encoder_rep=encoder_rep, bert_rep=out_bert, infonce=infonce,
            pooled=pooled, logits=logits,
        )

    def test_encoder_rep_matches(self, setup):
        p, hf, got, inputs = setup
        with torch.no_grad():
            want = self._torch_forward(p, hf, inputs)
        np.testing.assert_allclose(
            np.asarray(got["encoder_rep"]), want["encoder_rep"].numpy(), atol=1e-4
        )

    def test_bert_rep_matches(self, setup):
        p, hf, got, inputs = setup
        with torch.no_grad():
            want = self._torch_forward(p, hf, inputs)
        np.testing.assert_allclose(
            np.asarray(got["bert_rep"]), want["bert_rep"].numpy(), atol=1e-4
        )

    def test_infonce_pooled_logits_match(self, setup):
        p, hf, got, inputs = setup
        with torch.no_grad():
            want = self._torch_forward(p, hf, inputs)
        np.testing.assert_allclose(
            float(got["infonce_loss"]), float(want["infonce"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["pooled"]), want["pooled"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["logits"]), want["logits"].numpy(), atol=1e-4
        )
