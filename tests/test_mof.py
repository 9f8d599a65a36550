"""MOF capability: CIF parsing, MOF featurizer, gas/env heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdti_tpu.chem.mof import GAS2ATTR, MOFReader, coords2unimol_mof, parse_cif
from mmdti_tpu.models.mof import EnvModel, GasModel

CIF_SAMPLE = """
data_test
_cell_length_a    10.000
_cell_length_b    10.000
_cell_length_c    10.000
_cell_angle_alpha 90.0
_cell_angle_beta  90.0
_cell_angle_gamma 90.0
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Zn1 Zn 0.0 0.0 0.0
O1 O 0.25 0.25 0.25
C1 C 0.5 0.5 0.5
C2 C 0.75 0.75 0.75
"""


@pytest.fixture
def cif_path(tmp_path):
    p = tmp_path / "test.cif"
    p.write_text(CIF_SAMPLE)
    return str(p)


class TestCIF:
    def test_parse(self, cif_path):
        out = parse_cif(cif_path)
        assert out["atoms"] == ["Zn", "O", "C", "C"]
        assert out["coordinates"].shape == (4, 3)
        np.testing.assert_allclose(out["volume"], 1000.0, rtol=1e-5)
        np.testing.assert_allclose(out["coordinates"][1], [2.5, 2.5, 2.5], atol=1e-4)

    def test_parse_interleaved_columns(self, tmp_path):
        """x/y/z columns are read by header, not fx+1/fx+2 — an occupancy
        column between them must not become the y coordinate."""
        cif = (
            "data_test\n_cell_length_a 10.0\n_cell_length_b 10.0\n"
            "_cell_length_c 10.0\n_cell_angle_alpha 90.0\n_cell_angle_beta 90.0\n"
            "_cell_angle_gamma 90.0\nloop_\n_atom_site_type_symbol\n"
            "_atom_site_fract_x\n_atom_site_occupancy\n_atom_site_fract_y\n"
            "_atom_site_fract_z\nZn 0.1 1.0 0.2 0.3\n"
        )
        p = tmp_path / "inter.cif"
        p.write_text(cif)
        out = parse_cif(str(p))
        np.testing.assert_allclose(out["coordinates"][0], [1.0, 2.0, 3.0], atol=1e-4)

    def test_parse_missing_columns_raise(self, tmp_path):
        bad = (
            "data_test\nloop_\n_atom_site_occupancy\n_atom_site_fract_x\n"
            "1.0 0.1\n"
        )
        p = tmp_path / "bad.cif"
        p.write_text(bad)
        with pytest.raises(ValueError):
            parse_cif(str(p))

    def test_reader_with_gas(self, cif_path):
        reader = MOFReader()
        dd = reader.read_with_gas(cif_path, "CO2")
        assert dd["gas_id"] == 2
        assert dd["gas_attr"] == GAS2ATTR["CO2"]
        assert dd["src_tokens"].shape == (6,)
        # BOS/EOS rows of the distance matrix stay zero (MOF variant)
        assert (dd["src_distance"][0] == 0).all()
        assert (dd["src_distance"][-1] == 0).all()
        assert dd["src_distance"][1:-1, 1:-1].max() > 0

    def test_unknown_gas_raises(self, cif_path):
        with pytest.raises(AssertionError):
            MOFReader().read_with_gas(cif_path, "SF6")


class TestMofFeaturizer:
    def test_crop(self):
        rng = np.random.RandomState(0)
        from mmdti_tpu.chem import Dictionary

        d = Dictionary.load()
        feat = coords2unimol_mof(["C"] * 600, rng.randn(600, 3), d, max_atoms=512,
                                 crop_rng=np.random.RandomState(0))
        assert feat["src_tokens"].shape == (514,)


class TestHeads:
    def test_gas_model(self):
        m = GasModel(gas_attr_input_dim=6, gas_dim=8)
        gid = jnp.asarray([1, 2])
        attr = jnp.asarray(np.random.RandomState(0).randn(2, 6).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), gid, attr)
        out = m.apply(v, gid, attr)
        assert out.shape == (2, 16)

    def test_env_model(self):
        m = EnvModel(hidden_dim=8, bins=16,
                     min_max_key={"pressure": (0.0, 10.0), "temperature": (100.0, 400.0)})
        p = jnp.asarray([1.0, 20.0])  # second clamps to max
        t = jnp.asarray([250.0, 50.0])
        v = m.init(jax.random.PRNGKey(0), p, t)
        out = m.apply(v, p, t)
        assert out.shape == (2, 24)
        assert bool(jnp.isfinite(out).all())


class TestMofCollation:
    def test_mof_batch(self, cif_path):
        from mmdti_tpu.chem import SmilesTokenizer
        from mmdti_tpu.data import BatchCollator, MolDataset

        reader = MOFReader()
        samples = [reader.read_with_gas(cif_path, g) for g in ("CO2", "CH4", "N2")]
        for s, (t, p) in zip(samples, [(298.0, 1.0), (273.0, 5.0), (310.0, 2.0)]):
            s["temperature"], s["pressure"] = t, p
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=None)
        ds = MolDataset(samples, np.zeros((3, 1)))
        batch, labels = coll([ds[i] for i in range(3)])
        assert batch["src_tokens"].shape == (3, 16)
        assert batch["gas_id"].tolist() == [2, 1, 8]
        assert batch["gas_attr"].shape == (3, 6)
        assert batch["temperature"].shape == (3,)
        assert "input_ids" not in batch  # no SMILES stream for MOF samples
