"""End-to-end MOF capability: MolTrain(data_type='mof') on synthetic CIFs.

VERDICT r3 item 2: the reference defines MOF pieces (MOFReader, gas tables,
GasModel/EnvModel — /root/reference/data/datareader.py:204-307,
models/mm_model.py:130-209) but no trainable forward ever consumes them (the
only consumer, models/encoder.py, cannot import — SURVEY §2.2).  This suite
proves the repo's wiring IS trainable end to end: synthetic CIF crystals +
gas/pressure/temperature CSV -> DataHub MOF featurization -> MOFModel fit ->
artifact round-trip -> MolPredict with finite metrics.
"""

import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SMALL_ARCH

MOF_ARCH = dict(
    unimol_overrides=dict(SMALL_ARCH["unimol_overrides"]),
    compute_dtype="float32",
    use_pallas=False,
)

_CIF_TEMPLATE = """data_synthetic_{name}
_cell_length_a    {a:.4f}
_cell_length_b    {b:.4f}
_cell_length_c    {c:.4f}
_cell_angle_alpha 90.0
_cell_angle_beta  90.0
_cell_angle_gamma 90.0
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
{rows}"""


def _write_cif(path, seed, n_atoms=10):
    rng = np.random.RandomState(seed)
    symbols = rng.choice(["Zn", "O", "C", "H", "Cu"], size=n_atoms)
    frac = rng.rand(n_atoms, 3)
    rows = "\n".join(
        f"{s}{i} {s} {x:.4f} {y:.4f} {z:.4f}"
        for i, (s, (x, y, z)) in enumerate(zip(symbols, frac))
    )
    a, b, c = 8.0 + rng.rand(3) * 4.0
    with open(path, "w") as f:
        f.write(_CIF_TEMPLATE.format(name=os.path.basename(path), a=a, b=b, c=c, rows=rows))
    return path


@pytest.fixture(scope="module")
def mof_csvs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mof")
    rng = np.random.RandomState(0)
    rows = []
    gases = ["CO2", "CH4", "N2", "H2"]
    for i in range(16):
        cif = _write_cif(str(tmp / f"mof_{i}.cif"), seed=i, n_atoms=8 + (i % 5))
        rows.append({
            "cif": f"mof_{i}.cif",          # relative: resolves vs the CSV dir
            "gas": gases[i % len(gases)],
            "pressure": float(rng.rand() * 10),
            "temperature": float(273 + rng.rand() * 100),
            "uptake": float(rng.randn() * 2 + 5),
        })
    df = pd.DataFrame(rows)
    train, val = tmp / "train.csv", tmp / "val.csv"
    df.iloc[:12].to_csv(train, index=False)
    df.iloc[12:].to_csv(val, index=False)
    return str(train), str(val), str(tmp)


class TestMOFFingerprint:
    def test_mof_rev_rekeys_mof_caches_only(self):
        """The content-seeded crop changed MOF featurization output for the
        same knobs — MOF caches must re-key (mof_rev), molecule caches must
        not change."""
        from mmdti_tpu.data.hub import _featurizer_fingerprint

        fp_mof = _featurizer_fingerprint({"data_type": "mof"})
        fp_mol = _featurizer_fingerprint({"data_type": "molecule"})
        assert "mof_rev" in fp_mof and fp_mof["mof_rev"] >= 2
        assert "mof_rev" not in fp_mol


class TestCropDeterminism:
    def test_crop_independent_of_read_order(self, tmp_path):
        """A >max_atoms crystal must featurize identically at any dataset
        position: the crop RNG is seeded from the structure content, not a
        shared stream that advances with every previously-read row."""
        from mmdti_tpu.chem.mof import MOFReader

        big = _write_cif(str(tmp_path / "big.cif"), seed=0, n_atoms=40)
        small = _write_cif(str(tmp_path / "small.cif"), seed=1, n_atoms=6)
        r1 = MOFReader(max_atoms=16, seed=42)
        first = r1.read_with_gas(big, "CO2")
        r2 = MOFReader(max_atoms=16, seed=42)
        r2.read_with_gas(small, "CH4")  # advance any hypothetical stream
        after_other = r2.read_with_gas(big, "CO2")
        np.testing.assert_array_equal(
            first["src_tokens"], after_other["src_tokens"]
        )
        np.testing.assert_array_equal(
            first["src_coord"], after_other["src_coord"]
        )
        # different reader seed -> different crop (the knob still works)
        r3 = MOFReader(max_atoms=16, seed=7)
        other_seed = r3.read_with_gas(big, "CO2")
        assert not np.array_equal(
            first["src_tokens"], other_seed["src_tokens"]
        ) or not np.array_equal(first["src_coord"], other_seed["src_coord"])


class TestMOFModelForward:
    def test_forward_and_grads(self):
        import jax
        import jax.numpy as jnp

        from mmdti_tpu.models.mof import build_mof_model

        model = build_mof_model(
            output_dim=1, atom_vocab_size=35, atom_pad_idx=1,
            task="regression", **MOF_ARCH,
        )
        B, N = 4, 12
        rng = np.random.RandomState(0)
        toks = rng.randint(4, 30, (B, N))
        toks[:, 0] = 0
        toks[:, -1] = 2
        feats = {
            "src_tokens": jnp.asarray(toks),
            "src_distance": jnp.asarray(rng.rand(B, N, N).astype(np.float32) * 6),
            "src_edge_type": jnp.asarray(rng.randint(0, 35 * 35, (B, N, N))),
            "gas_id": jnp.asarray(rng.randint(1, 10, (B,))),
            "gas_attr": jnp.asarray(rng.randn(B, 6).astype(np.float32)),
            "pressure": jnp.asarray(rng.rand(B).astype(np.float32) * 10),
            "temperature": jnp.asarray(273 + rng.rand(B).astype(np.float32) * 100),
        }
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, **feats, deterministic=True)
        assert out["logits"].shape == (B, 1)
        assert out["pooled"].shape[1] == MOF_ARCH["unimol_overrides"]["embed_dim"]
        assert np.isfinite(np.asarray(out["logits"])).all()

        y = jnp.asarray(rng.randn(B, 1).astype(np.float32))

        def loss(p):
            o = model.apply({"params": p}, **feats, deterministic=True)
            return jnp.mean((o["logits"] - y) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        # gradient reaches the gas/env heads AND the encoder: the MOF inputs
        # are load-bearing, not decorative
        for mod in ("gas_model", "env_model", "fusion_proj", "encoder"):
            leaves = jax.tree.leaves(grads[mod])
            assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves), mod

    def test_missing_gas_inputs_raise(self):
        import jax
        import jax.numpy as jnp

        from mmdti_tpu.models.mof import build_mof_model

        model = build_mof_model(
            output_dim=1, atom_vocab_size=35, atom_pad_idx=1,
            task="regression", **MOF_ARCH,
        )
        toks = jnp.ones((2, 8), jnp.int32)
        with pytest.raises(ValueError, match="gas_id"):
            model.init(
                {"params": jax.random.PRNGKey(0)}, src_tokens=toks,
                src_distance=jnp.zeros((2, 8, 8)),
                src_edge_type=jnp.zeros((2, 8, 8), jnp.int32),
                deterministic=True,
            )


class TestMOFReaderPath:
    def test_featurize_from_csv(self, mof_csvs):
        from mmdti_tpu.data.hub import DataHub

        train, _, _ = mof_csvs
        hub = DataHub(
            data=train, is_train=True, task="regression", data_type="mof",
            target_cols=["uptake"], use_scaler=False,
        )
        feats = hub.data["unimol_input"]
        assert len(feats) == 12
        for f in feats:
            assert f["src_tokens"][0] == 0 and f["src_tokens"][-1] == 2
            n = len(f["src_tokens"])
            assert f["src_distance"].shape == (n, n)
            # MOF featurizer zeroes the BOS/EOS distance rows
            assert float(np.abs(f["src_distance"][0]).max()) == 0.0
            assert 1 <= f["gas_id"] <= 9
            assert len(f["gas_attr"]) == 6
            assert "pressure" in f and "temperature" in f

    def test_infonce_refused_for_mof(self, mof_csvs):
        from mmdti_tpu import MolTrain

        train, val, tmp = mof_csvs
        m = MolTrain(
            task="regression", data_type="mof", epochs=1, batch_size=4,
            target_cols=["uptake"], save_path=os.path.join(tmp, "exp_refuse"),
            using_infonce=True, **MOF_ARCH,
        )
        with pytest.raises(ValueError, match="mof"):
            m.fit(train, val)


class TestMOFEndToEnd:
    def test_fit_predict_roundtrip(self, mof_csvs):
        from mmdti_tpu import MolPredict, MolTrain

        train, val, tmp = mof_csvs
        exp = os.path.join(tmp, "exp")
        m = MolTrain(
            task="regression", data_type="mof", epochs=2, batch_size=4,
            metrics="mse", target_cols=["uptake"], save_path=exp,
            using_ct=True, seed=7, **MOF_ARCH,
        )
        m.fit(train, val)
        assert np.isfinite(np.asarray(m.cv_pred)).all()
        for artifact in ("config.yaml", "model_0.ckpt", "target_scaler.ss"):
            assert os.path.exists(os.path.join(exp, artifact)), artifact

        pred = MolPredict(load_model=exp)
        out = pred.predict(val, save_path=os.path.join(tmp, "pred_out"))
        out = np.asarray(out)
        assert out.shape[0] == 4
        assert np.isfinite(out).all()
        # ground truth present -> metrics artifact written
        assert os.path.exists(os.path.join(tmp, "pred_out", "test_metric.result"))
        csvs = [
            f for f in os.listdir(os.path.join(tmp, "pred_out"))
            if f.endswith(".csv")
        ]
        assert csvs, "prediction CSV artifact missing"
        df = pd.read_csv(os.path.join(tmp, "pred_out", csvs[0]))
        pcols = [c for c in df.columns if c.startswith("predict_")]
        assert pcols and np.isfinite(df[pcols[0]].values).all()

    def test_fit_on_dp_mesh_matches_single_device(self, mof_csvs):
        """The MOF path under data parallelism: an 8-device DP fit must
        reproduce the single-device predictions (the MOF auxiliary inputs —
        gas_id/gas_attr/pressure/temperature — shard over 'data' like every
        other batch leaf; the molecule-path DP tests never exercise them)."""
        from mmdti_tpu import MolTrain

        train, val, tmp = mof_csvs
        preds = {}
        for name, mesh in (("single", (1, 1)), ("dp8", (8, 1))):
            m = MolTrain(
                task="regression", data_type="mof", epochs=1, batch_size=8,
                metrics="mse", target_cols=["uptake"],
                save_path=os.path.join(tmp, f"exp_{name}"),
                seed=11, mesh_shape=mesh, **MOF_ARCH,
            )
            m.fit(train, val)
            preds[name] = np.asarray(m.cv_pred, dtype=float).reshape(-1)
        assert np.isfinite(preds["single"]).all()
        np.testing.assert_allclose(
            preds["dp8"], preds["single"], rtol=2e-4, atol=1e-5
        )
