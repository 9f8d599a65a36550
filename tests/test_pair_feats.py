"""Device-side pair featurization (ops/pair_feats.py).

The TPU input pipeline ships [B,N] tokens + [B,N,3] coords and reconstructs
the [B,N,N] distance/edge arrays inside the jit; these tests pin the
reconstruction to the host collation semantics (BatchCollator pair padding,
featurizer numerics from chem/conformer.py coords2unimol) on real featurized
molecules, and the end-to-end model equivalence between the two input modes.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mmdti_tpu.chem.conformer import ConformerGen
from mmdti_tpu.chem.tokenizer import SmilesTokenizer
from mmdti_tpu.data.batching import BatchCollator, MolDataset
from mmdti_tpu.ops.pair_feats import pair_feats_from_coords

from tests.conftest import SMILES_20


@pytest.fixture(scope="module")
def featurized():
    gen = ConformerGen()
    feats = gen.transform(SMILES_20[:6])
    for f, s in zip(feats, SMILES_20[:6]):
        f["smile"] = s
    return gen, feats


def _collate(feats, pair_feats, pad_idx, atom_pad=32):
    coll = BatchCollator(
        SmilesTokenizer(), pad_idx=pad_idx, pad_mode="dataset",
        atom_pad=atom_pad, smiles_pad=24, pair_feats=pair_feats,
    )
    samples = [(f, np.zeros(1, np.float32)) for f in feats]
    batch, _ = coll(samples)
    return batch


class TestReconstruction:
    def test_matches_host_collation(self, featurized):
        """Device-reconstructed distance/edge == host-padded arrays on real
        featurized molecules (ragged lengths, BOS/EOS zero-coord rows)."""
        gen, feats = featurized
        pad_idx = gen.dictionary.pad()
        host = _collate(feats, "host", pad_idx)
        dev = _collate(feats, "device", pad_idx)

        assert "src_distance" not in dev and "src_edge_type" not in dev
        assert dev["src_coord"].shape == host["src_tokens"].shape + (3,)

        dist, edge = pair_feats_from_coords(
            jnp.asarray(dev["src_tokens"]), jnp.asarray(dev["src_coord"]),
            vocab=len(gen.dictionary), pad_idx=pad_idx,
        )
        np.testing.assert_array_equal(np.asarray(edge), host["src_edge_type"])
        np.testing.assert_allclose(
            np.asarray(dist), host["src_distance"], rtol=0, atol=1e-5
        )

    def test_pad_rows_zeroed(self, featurized):
        """Pad-row cross terms must be 0 distance / pad-index edge even though
        pad coords sit at the origin next to real atoms."""
        gen, feats = featurized
        pad_idx = gen.dictionary.pad()
        dev = _collate(feats[:2], "device", pad_idx, atom_pad=48)
        dist, edge = pair_feats_from_coords(
            jnp.asarray(dev["src_tokens"]), jnp.asarray(dev["src_coord"]),
            vocab=len(gen.dictionary), pad_idx=pad_idx,
        )
        n_real = int((dev["src_tokens"][0] != pad_idx).sum())
        assert (np.asarray(dist)[0, :, n_real:] == 0).all()
        assert (np.asarray(dist)[0, n_real:, :] == 0).all()
        assert (np.asarray(edge)[0, :, n_real:] == pad_idx).all()
        assert (np.asarray(edge)[0, n_real:, :] == pad_idx).all()

    def test_mof_batches_ship_coords_in_device_mode(self, featurized):
        """Round 5: MOF batches take the device pair-feats path too
        (mof_pair_feats_from_coords models the zeroed BOS/EOS distance
        rows); at MOF scales (N up to 512) the host [B,N,N] arrays are
        ~260x the coord bytes through the tunnel."""
        gen, feats = featurized
        f = dict(feats[0])
        f["gas_id"] = 3
        f["gas_attr"] = np.zeros(6, np.float32)
        batch = _collate([f], "device", gen.dictionary.pad())
        assert "src_coord" in batch and "src_distance" not in batch

    def test_mof_device_reconstruction_matches_host(self):
        """mof_pair_feats_from_coords == coords2unimol_mof's host arrays
        (BOS/EOS rows zero in distance, full outer product in edge),
        including padded batches of mixed sizes."""
        from mmdti_tpu.chem.dictionary import Dictionary
        from mmdti_tpu.chem.mof import coords2unimol_mof
        from mmdti_tpu.ops.pair_feats import mof_pair_feats_from_coords
        from mmdti_tpu.utils.padding import pad_1d_tokens, pad_2d, pad_coords

        d = Dictionary.load(None)
        rng = np.random.RandomState(0)
        samples = [
            coords2unimol_mof(
                ["C", "O", "Zn", "C", "O"][: 3 + i],
                rng.randn(3 + i, 3).astype(np.float32) * 3.0,
                d,
            )
            for i in range(3)
        ]
        pad_idx = d.pad()
        pad_n = max(len(s["src_tokens"]) for s in samples) + 2  # force pads
        toks = pad_1d_tokens(
            [np.asarray(s["src_tokens"], np.int32) for s in samples],
            pad_idx, pad_to_length=pad_n,
        )
        coords = pad_coords(
            [np.asarray(s["src_coord"], np.float32) for s in samples],
            0.0, pad_to_length=pad_n,
        )
        want_dist = pad_2d(
            [np.asarray(s["src_distance"], np.float32) for s in samples],
            0.0, pad_to_length=pad_n,
        )
        want_edge = pad_2d(
            [np.asarray(s["src_edge_type"], np.int32) for s in samples],
            pad_idx, pad_to_length=pad_n,
        )
        dist, edge = mof_pair_feats_from_coords(
            jnp.asarray(toks), jnp.asarray(coords),
            vocab=len(d), pad_idx=pad_idx,
        )
        np.testing.assert_allclose(np.asarray(dist), want_dist, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(edge), want_edge)


@pytest.mark.heavy
class TestModelEquivalence:
    def test_forward_identical_between_input_modes(self, featurized):
        """MMModel(coords) == MMModel(distance, edge) on the same params."""
        import jax

        from mmdti_tpu.models import build_model

        gen, feats = featurized
        pad_idx = gen.dictionary.pad()
        host = _collate(feats, "host", pad_idx)
        dev = _collate(feats, "device", pad_idx)

        model = build_model(
            output_dim=1, atom_vocab_size=len(gen.dictionary),
            atom_pad_idx=pad_idx, task="regression",
            smiles_vocab_size=600, compute_dtype="float32",
            unimol_overrides={
                "encoder_layers": 1, "embed_dim": 16, "ffn_embed_dim": 32,
                "attention_heads": 2, "dropout": 0.0, "emb_dropout": 0.0,
                "attention_dropout": 0.0, "pooler_dropout": 0.0,
            },
            chemberta_overrides={
                "hidden_size": 16, "num_hidden_layers": 1,
                "num_attention_heads": 2, "intermediate_size": 32,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
        )
        keys = ("src_tokens", "src_distance", "src_edge_type", "src_coord",
                "input_ids", "attention_mask")
        f_host = {k: jnp.asarray(v) for k, v in host.items() if k in keys}
        f_dev = {k: jnp.asarray(v) for k, v in dev.items() if k in keys}
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng, "dropout": rng}, **f_host, deterministic=True
        )["params"]
        out_h = model.apply({"params": params}, **f_host, deterministic=True)
        out_d = model.apply({"params": params}, **f_dev, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_h["logits"]), np.asarray(out_d["logits"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_h["pooled"]), np.asarray(out_d["pooled"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_missing_both_inputs_raises(self, featurized):
        import jax

        from mmdti_tpu.models import build_model

        gen, feats = featurized
        pad_idx = gen.dictionary.pad()
        host = _collate(feats[:1], "host", pad_idx, atom_pad=16)
        model = build_model(
            output_dim=1, atom_vocab_size=len(gen.dictionary),
            atom_pad_idx=pad_idx, task="regression", smiles_vocab_size=600,
            compute_dtype="float32",
            unimol_overrides={
                "encoder_layers": 1, "embed_dim": 16, "ffn_embed_dim": 32,
                "attention_heads": 2,
            },
        )
        rng = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="src_coord"):
            model.init(
                {"params": rng, "dropout": rng},
                src_tokens=jnp.asarray(host["src_tokens"]),
                input_ids=jnp.asarray(host["input_ids"]),
                attention_mask=jnp.asarray(host["attention_mask"]),
                deterministic=True,
            )

    def test_collator_rejects_unknown_mode(self):
        with pytest.raises(ValueError, match="pair_feats"):
            BatchCollator(SmilesTokenizer(), pad_idx=1, pair_feats="gpu")

    def test_resolve_mode_spellings(self):
        """YAML/CLI round-tripped booleans and typos: bool-ish strings map to
        their mode, anything unrecognized raises instead of silently falling
        back to 'host' (which re-ships the dense [B,N,N] arrays per batch —
        input-bound training with no error anywhere)."""
        from mmdti_tpu.ops.pair_feats import resolve_pair_feats_mode as r

        assert r(True) == r("true") == r("on") == r("device") == "device"
        assert r(False) == r("off") == r("host") == r("false") == "host"
        for bad in ("devcie", "yes please", 3.5):
            with pytest.raises(ValueError, match="device_pair_feats"):
                r(bad)

    def test_missing_smiles_inputs_raise_by_name(self, featurized):
        """input_ids/attention_mask became keyword-optional for signature
        reasons only — omitting them must fail with a named error, not
        opaquely inside the ChemBERTa trace."""
        import jax

        from mmdti_tpu.models import build_model

        gen, feats = featurized
        pad_idx = gen.dictionary.pad()
        host = _collate(feats[:1], "host", pad_idx, atom_pad=16)
        model = build_model(
            output_dim=1, atom_vocab_size=len(gen.dictionary),
            atom_pad_idx=pad_idx, task="regression", smiles_vocab_size=600,
            compute_dtype="float32",
            unimol_overrides={
                "encoder_layers": 1, "embed_dim": 16, "ffn_embed_dim": 32,
                "attention_heads": 2,
            },
        )
        rng = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="input_ids"):
            model.init(
                {"params": rng, "dropout": rng},
                src_tokens=jnp.asarray(host["src_tokens"]),
                src_distance=jnp.asarray(host["src_distance"]),
                src_edge_type=jnp.asarray(host["src_edge_type"]),
                deterministic=True,
            )


class TestFeaturizerCollatorCoherence:
    def test_host_collation_of_device_features_switches_mode(self, tmp_path):
        """pair_feats=False features (no host pair arrays) with a collator
        that resolved to 'host' (the CPU default) must train, not KeyError
        on the first batch: NNModel inspects the features and switches the
        collator to device-side reconstruction."""
        import pandas as pd

        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(0)
        df = pd.DataFrame(
            {"smiles": SMILES_20[:12], "measured": rng.randn(12)}
        )
        train, val = tmp_path / "tr.csv", tmp_path / "va.csv"
        df.iloc[:8].to_csv(train, index=False)
        df.iloc[8:].to_csv(val, index=False)
        exp = str(tmp_path / "exp")
        clf = MolTrain(
            task="regression", epochs=1, batch_size=4, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["measured"],
            seed=7, compute_dtype="float32", use_pallas=False,
            pair_feats=False,  # featurizer skips host pair arrays
            # device_pair_feats left at 'auto' -> 'host' on CPU: the
            # mismatch this test pins
            **SMALL_ARCH,
        )
        clf.fit(str(train), str(val))
        assert os.path.exists(os.path.join(exp, "model_0.ckpt"))
