"""Pretrained checkpoint ingestion tests.

The reference loads a Uni-Mol unicore ``.pt`` with strict=False
(/root/reference/models/mm_model.py:499-514) — tolerant of extra keys, but a
naming drift silently trains from scratch.  These tests build a synthetic
unicore-format state dict (``unimat.``-prefixed, torch (out, in) Linear
layout) with tiny shapes matching a tiny MMModel, and assert the converter
actually lands every tensor, transposes Dense kernels, changes the forward
output, and errors loudly when nothing maps.
"""

import numpy as np
import pytest

from tests.conftest import SMALL_ARCH

ATOM_VOCAB = 16
E = 32  # embed_dim
FFN = 64
H = 4
LAYERS = 2
NUM_EDGE = ATOM_VOCAB * ATOM_VOCAB
K = 128  # gaussian kernels


def _tiny_model():
    from mmdti_tpu.models.mm_model import build_model

    return build_model(
        output_dim=1, atom_vocab_size=ATOM_VOCAB, atom_pad_idx=0,
        task="regression", smiles_vocab_size=60,
        unimol_overrides=SMALL_ARCH["unimol_overrides"],
        chemberta_overrides=SMALL_ARCH["chemberta_overrides"],
    )


def _init_tree(model):
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    nprng = np.random.RandomState(0)
    tok = nprng.randint(3, ATOM_VOCAB, size=(2, 8)).astype(np.int32)  # no pad idx
    dist = np.abs(nprng.randn(2, 8, 8)).astype(np.float32)
    dist = dist + dist.transpose(0, 2, 1)
    batch = dict(
        src_tokens=jnp.asarray(tok),
        src_distance=jnp.asarray(dist),
        src_edge_type=jnp.asarray(tok[:, :, None] * ATOM_VOCAB + tok[:, None, :]),
        input_ids=jnp.asarray(nprng.randint(4, 50, size=(2, 8)).astype(np.int32)),
        attention_mask=jnp.ones((2, 8), jnp.int32),
    )
    variables = model.init({"params": rng, "dropout": rng}, **batch, deterministic=True)
    import flax

    tree = jax.tree.map(np.asarray, flax.core.unfreeze(variables["params"]))
    return tree, batch


def _synthetic_unicore_sd(rng):
    """Unicore naming per the reference checkpoint contract: Linear weights in
    torch (out_features, in_features) layout; gbf tables are nn.Embedding
    weights (so means/stds carry a leading 1-dim the converter flattens)."""
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, d=E):
        sd[f"{name}.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32)

    sd["embed_tokens.weight"] = rng.randn(ATOM_VOCAB, E).astype(np.float32)
    sd["gbf.means.weight"] = rng.randn(1, K).astype(np.float32)
    sd["gbf.stds.weight"] = rng.rand(1, K).astype(np.float32) + 0.1
    sd["gbf.mul.weight"] = rng.randn(NUM_EDGE, 1).astype(np.float32)
    sd["gbf.bias.weight"] = rng.randn(NUM_EDGE, 1).astype(np.float32)
    lin("gbf_proj.linear1", K, K)
    lin("gbf_proj.linear2", K, H)
    ln("encoder.emb_layer_norm")
    ln("encoder.final_layer_norm")
    for i in range(LAYERS):
        t = f"encoder.layers.{i}"
        lin(f"{t}.self_attn.in_proj", E, 3 * E)
        lin(f"{t}.self_attn.out_proj", E, E)
        ln(f"{t}.self_attn_layer_norm")
        ln(f"{t}.final_layer_norm")
        lin(f"{t}.fc1", E, FFN)
        lin(f"{t}.fc2", FFN, E)
    lin("classification_head.dense", E, E)
    lin("classification_head.out_proj", E, 1)
    return sd


class TestUniMolIngestion:
    @pytest.fixture(scope="class")
    def loaded(self):
        from mmdti_tpu.models.convert import convert_unimol_checkpoint

        model = _tiny_model()
        tree, batch = _init_tree(model)
        import copy

        before = copy.deepcopy(tree)
        rng = np.random.RandomState(7)
        sd = _synthetic_unicore_sd(rng)
        # full unicore envelope: 'model' wrapper + unimat. prefix + an extra
        # pretraining-head key the mapper must skip (strict=False parity)
        ckpt = {"model": {f"unimat.{k}": v for k, v in sd.items()}}
        ckpt["model"]["unimat.lm_head.dense.weight"] = rng.randn(E, E).astype(np.float32)
        after = convert_unimol_checkpoint(ckpt, tree)
        return model, before, after, sd, batch

    def test_all_encoder_tensors_land(self, loaded):
        _, before, after, sd, _ = loaded
        # Dense kernels transposed from torch (out,in) to flax (in,out)
        np.testing.assert_array_equal(
            after["encoder"]["layers_0"]["fc1"]["kernel"],
            sd["encoder.layers.0.fc1.weight"].T,
        )
        np.testing.assert_array_equal(
            after["encoder"]["layers_1"]["in_proj"]["kernel"],
            sd["encoder.layers.1.self_attn.in_proj.weight"].T,
        )
        np.testing.assert_array_equal(
            after["classification_head"]["out_proj"]["kernel"],
            sd["classification_head.out_proj.weight"].T,
        )
        # biases and LN params land untransposed
        np.testing.assert_array_equal(
            after["encoder"]["layers_0"]["fc1"]["bias"], sd["encoder.layers.0.fc1.bias"]
        )
        np.testing.assert_array_equal(
            after["encoder"]["final_layer_norm"]["ln"]["scale"],
            sd["encoder.final_layer_norm.weight"],
        )
        # gbf embedding tables: means/stds flattened, mul/bias kept 2D
        np.testing.assert_array_equal(after["gbf"]["means"], sd["gbf.means.weight"].reshape(-1))
        np.testing.assert_array_equal(after["gbf"]["mul"], sd["gbf.mul.weight"])
        np.testing.assert_array_equal(
            after["embed_tokens"]["embedding"], sd["embed_tokens.weight"]
        )
        np.testing.assert_array_equal(
            after["gbf_proj"]["linear1"]["kernel"], sd["gbf_proj.linear1.weight"].T
        )
        # every mapped subtree actually changed from the random init
        for sub in ("embed_tokens", "gbf", "gbf_proj", "encoder", "classification_head"):
            flat_b = np.concatenate([np.ravel(x) for x in _leaves(before[sub])])
            flat_a = np.concatenate([np.ravel(x) for x in _leaves(after[sub])])
            assert not np.array_equal(flat_b, flat_a), f"{sub} untouched by ingestion"

    def test_untouched_subtrees_preserved(self, loaded):
        _, before, after, _, _ = loaded
        for sub in ("bert", "cross_modal_module", "infonce"):
            flat_b = np.concatenate([np.ravel(x) for x in _leaves(before[sub])])
            flat_a = np.concatenate([np.ravel(x) for x in _leaves(after[sub])])
            np.testing.assert_array_equal(flat_b, flat_a)

    def test_forward_changes(self, loaded):
        model, before, after, _, batch = loaded
        out_b = model.apply({"params": before}, **batch, deterministic=True)
        out_a = model.apply({"params": after}, **batch, deterministic=True)
        d = np.abs(np.asarray(out_b["logits"]) - np.asarray(out_a["logits"])).max()
        assert d > 1e-6, "pretrained load did not change the forward output"

    def test_zero_loaded_is_loud(self):
        from mmdti_tpu.models.convert import convert_unimol_checkpoint

        model = _tiny_model()
        tree, _ = _init_tree(model)
        junk = {"model": {"decoder.blocks.0.w.weight": np.zeros((4, 4), np.float32)}}
        with pytest.raises(ValueError, match="0 tensors"):
            convert_unimol_checkpoint(junk, tree)


class TestLoadPretrainedFile:
    def test_torch_pt_roundtrip(self, tmp_path):
        """The load_pretrained file branch: torch.save -> .pt -> ingestion."""
        torch = pytest.importorskip("torch")
        from mmdti_tpu.models.convert import load_pretrained

        model = _tiny_model()
        tree, batch = _init_tree(model)
        rng = np.random.RandomState(3)
        sd = _synthetic_unicore_sd(rng)
        ckpt = {"model": {f"unimat.{k}": torch.from_numpy(v) for k, v in sd.items()}}
        path = tmp_path / "unimol_mm.pt"
        torch.save(ckpt, str(path))
        loaded = load_pretrained(tree, unimol_dir=str(path))
        np.testing.assert_array_equal(
            loaded["encoder"]["layers_0"]["fc2"]["kernel"],
            sd["encoder.layers.0.fc2.weight"].T,
        )


def _leaves(tree):
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree):
            out.extend(_leaves(tree[k]))
        return out
    return [np.asarray(tree)]


class TestChemBertaIngestionGuards:
    def test_zero_loaded_is_loud(self):
        """A dims mismatch that shape-skips every tensor must raise, not
        silently train from scratch (the unimol converter's contract)."""
        from mmdti_tpu.models.convert import convert_hf_roberta

        import flax.linen as fnn
        import jax

        from mmdti_tpu.configs.architectures import ChemBertaConfig
        from mmdti_tpu.models.chemberta import ChemBerta

        cfg = ChemBertaConfig(vocab_size=60, hidden_size=32, num_hidden_layers=1,
                              num_attention_heads=2, intermediate_size=64)
        model = ChemBerta(cfg)
        ids = np.ones((1, 8), np.int32)
        params = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids),
                            deterministic=True)["params"]
        params = jax.tree.map(np.asarray, params)
        # checkpoint claims hidden 16 — every tensor mismatches
        sd = {
            "embeddings.word_embeddings.weight": np.zeros((60, 16), np.float32),
            "encoder.layer.0.attention.self.query.weight": np.zeros((16, 16), np.float32),
            "encoder.layer.0.attention.self.query.bias": np.zeros((16,), np.float32),
        }
        with pytest.raises(ValueError, match="0 tensors"):
            convert_hf_roberta(sd, params)

    def test_hf_config_json_overrides(self, tmp_path):
        """config.json dims flow into the built model; explicit user
        overrides win."""
        import json

        from mmdti_tpu.models.convert import hf_chemberta_overrides

        d = str(tmp_path)
        with open(f"{d}/config.json", "w") as f:
            json.dump({"vocab_size": 600, "hidden_size": 384,
                       "num_hidden_layers": 3, "num_attention_heads": 6,
                       "intermediate_size": 768, "model_type": "roberta",
                       "bos_token_id": 0}, f)
        ov = hf_chemberta_overrides(d)
        assert ov["hidden_size"] == 384 and ov["num_hidden_layers"] == 3
        assert "model_type" not in ov and "bos_token_id" not in ov
        merged = {**ov, **{"num_hidden_layers": 1}}  # user override wins
        assert merged["num_hidden_layers"] == 1
        assert hf_chemberta_overrides(str(tmp_path / "nope")) == {}

    def test_build_model_accepts_vocab_size_override(self):
        """chemberta_overrides copied from an HF config.json contain
        vocab_size — must override, not raise 'multiple values'."""
        from mmdti_tpu.models.mm_model import build_model

        m = build_model(
            output_dim=1, atom_vocab_size=32, atom_pad_idx=1, task="regression",
            smiles_vocab_size=600,
            unimol_overrides={"encoder_layers": 1, "embed_dim": 32,
                              "ffn_embed_dim": 64, "attention_heads": 4},
            chemberta_overrides={"vocab_size": 77, "hidden_size": 32,
                                 "num_hidden_layers": 1,
                                 "num_attention_heads": 2,
                                 "intermediate_size": 64},
        )
        assert m.chemberta_cfg.vocab_size == 77


class TestNumericalEmbedInit:
    def test_w_edge_std_matches_torch_kaiming(self):
        """torch kaiming_normal_ on [edge_types, K] uses fan_in = K:
        std = sqrt(2/K) (the jax default would use edge_types, ~3x smaller)."""
        import jax

        from mmdti_tpu.models.gaussian import NumericalEmbed

        mod = NumericalEmbed(kernels=128, edge_types=1225)
        dist = np.zeros((1, 4, 4), np.float32)
        et = np.zeros((1, 4, 4), np.int32)
        params = mod.init(jax.random.PRNGKey(0), dist, et)["params"]
        std = float(np.asarray(params["w_edge"]).std())
        expect = float(np.sqrt(2.0 / 128.0))
        assert abs(std - expect) / expect < 0.1, (std, expect)
