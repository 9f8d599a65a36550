"""Accelerator-side conformer refinement (ops/device_refine.py +
chem/device_conformer.py).

The device refiner runs the SAME energy model as the host reference
(chem/conformer.py `_refine`, float64) in float32 on padded batches.  The
trajectories are not bitwise comparable across precisions, so equivalence
is asserted where it matters: the refined geometry (distance matrices) and
the energy reached.  Determinism is asserted exactly: a molecule's
coordinates must not depend on what it is co-batched with.
"""

import numpy as np
import pytest

import mmdti_tpu.chem.device_conformer as dc
from mmdti_tpu.chem.conformer import (
    ConformerGen,
    _build_terms,
    _refine,
    resolve_coord_provider,
)
from mmdti_tpu.chem.smiles import parse_smiles
from mmdti_tpu.ops.device_refine import refine_conformers, refine_energy

SMILES = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O"]


def _host_inputs(smi, seed=42):
    mol = parse_smiles(smi).add_hydrogens()
    n = mol.num_atoms()
    rng = np.random.RandomState(seed)
    scale = max(1.5, 0.8 * n ** (1.0 / 3.0) * 2.0)
    coords0 = rng.randn(n, 3).astype(np.float32) * scale
    return mol, coords0


def _device_batch(smis, seed=42):
    prepared = {}
    metas = []
    for i, smi in enumerate(smis):
        item = dc._prepare(smi, seed)
        bucket = dc._atom_bucket(len(item[0]))
        prepared.setdefault(bucket, []).append((i, item))
        metas.append(item)
    out = dc.DeviceConformerBatcher(iters=300).refine_groups(prepared)
    return [out[i] for i in range(len(smis))], metas


def _dmat(x):
    d = x[:, None, :] - x[None, :, :]
    return np.sqrt((d * d).sum(-1))


class TestRefineParity:
    @pytest.mark.parametrize("smi", SMILES)
    def test_geometry_matches_host_float64_refine(self, smi):
        mol, coords0 = _host_inputs(smi)
        terms = _build_terms(mol)
        host = _refine(coords0.copy(), terms, iters=300)

        (dev,), _ = _device_batch([smi])
        assert dev.shape == host.shape
        # float32 vs float64 trajectories drift, but both must land in the
        # same minimum basin: compare the geometry the model actually sees
        np.testing.assert_allclose(_dmat(dev), _dmat(host), atol=0.15)

    @pytest.mark.parametrize("smi", SMILES)
    def test_energy_quality(self, smi):
        """Device refinement reaches (at least) the host refiner's energy
        basin and massively improves on the random init."""
        mol, coords0 = _host_inputs(smi)
        (dev,), metas = _device_batch([smi])
        atoms, c0, bi, bl, ai, al = metas[0]
        n = len(atoms)

        def energy(x):
            m = np.ones((1, n), np.float32)
            return float(refine_energy(
                x[None], m, bi[None], bl[None], ai[None], al[None]
            )[0])

        host = _refine(coords0.copy(), _build_terms(mol), iters=300)
        e_dev, e_host, e_init = energy(dev), energy(host), energy(coords0)
        assert e_dev <= e_host * 1.10 + 1e-3, (e_dev, e_host)
        assert e_dev < e_init * 0.2, (e_dev, e_init)


# The DOCUMENTED batch-composition-independence bound (CLAUDE.md/PERF.md):
# per-molecule refined coords depend on co-riders only through XLA's
# batched-matmul codegen, accumulating ~1e-6 A of ULP drift over 300
# iterations.  Pinned at 10x the documented drift so codegen changes that
# widen it materially (e.g. to 1e-3 A, which would start to matter
# physically and poison the featurization cache) fail loudly here rather
# than pass under a slack tolerance (VERDICT r4).
BATCH_COMPOSITION_ATOL = 1e-5


class TestDeterminism:
    def test_coords_independent_of_co_batched_molecules(self):
        """Same bucket, different batch composition: coords agree to float
        accumulation noise (the padded SHAPES are batch-invariant by
        construction; the batch count M still changes XLA's batched-matmul
        codegen, so 300 iterations accumulate ~1e-6 A of ULP drift —
        physically meaningless, asserted bounded here)."""
        alone, _ = _device_batch(["CCO"])
        pair, _ = _device_batch(["CCO", "CCN"])  # both land in bucket 16
        np.testing.assert_allclose(alone[0], pair[0],
                                   atol=BATCH_COMPOSITION_ATOL)

    def test_single_process_matches_transform(self):
        gen = ConformerGen(coord_provider="device", seed=42)
        via_batch = gen.transform(["CCO", "c1ccccc1"])
        via_single = gen.single_process("CCO")
        # same ULP-drift bound as co-batching (the batch count differs)
        np.testing.assert_allclose(
            via_batch[0]["src_coord"], via_single["src_coord"],
            atol=BATCH_COMPOSITION_ATOL,
        )
        np.testing.assert_array_equal(
            via_batch[0]["src_tokens"], via_single["src_tokens"]
        )

    def test_repeat_calls_identical(self):
        a, _ = _device_batch(["CC(=O)O"])
        b, _ = _device_batch(["CC(=O)O"])
        np.testing.assert_array_equal(a[0], b[0])


class TestProviderPlumbing:
    def test_resolve(self):
        assert resolve_coord_provider("host") == "host"
        assert resolve_coord_provider("device") == "device"
        # on the CPU test backend 'auto' must stay host (no surprise
        # accelerator dependency in data tooling)
        assert resolve_coord_provider("auto") == "host"

    def test_bad_provider_rejected(self):
        with pytest.raises(ValueError, match="coord_provider"):
            ConformerGen(coord_provider="gpu")

    def test_term_cap_fallback_to_host(self, monkeypatch):
        """Molecules whose term counts exceed the per-bucket caps refine on
        the host — same ladder, logged."""
        monkeypatch.setattr(dc, "_NB_FACTOR", 0)
        out = dc.device_smi2coords_batch(["CCO"], seed=42)
        atoms, coords = out[0]
        from mmdti_tpu.chem.conformer import builtin_smi2coords

        h_atoms, h_coords = builtin_smi2coords("CCO", seed=42)
        assert atoms == h_atoms
        np.testing.assert_allclose(coords, h_coords, atol=1e-5)

    def test_provider_in_cache_fingerprint(self):
        from mmdti_tpu.data.hub import _featurizer_fingerprint

        fp_host = _featurizer_fingerprint({"coord_provider": "host"})
        fp_dev = _featurizer_fingerprint({"coord_provider": "device"})
        assert fp_host != fp_dev
        assert fp_dev["coord_provider"] == "device"
        # the size-routing threshold re-keys device caches but never host
        assert "device_refine_min_atoms" in fp_dev
        assert "device_refine_min_atoms" not in fp_host
        fp_dev2 = _featurizer_fingerprint(
            {"coord_provider": "device", "device_refine_min_atoms": 16}
        )
        assert fp_dev2 != fp_dev

    def test_small_molecules_route_to_host_refiner(self):
        """Below min_atoms the device provider must produce EXACTLY the host
        refiner's coordinates (per-molecule deterministic size routing — the
        host refiner beats the device dispatch's fixed transfer cost for
        small molecules)."""
        from mmdti_tpu.chem.conformer import builtin_smi2coords

        out = dc.device_smi2coords_batch(
            ["CCO", "C" * 40], seed=42, min_atoms=48
        )
        atoms_s, coords_s = out[0]      # 9 atoms -> host
        h_atoms, h_coords = builtin_smi2coords("CCO", seed=42)
        assert atoms_s == h_atoms
        np.testing.assert_array_equal(coords_s, h_coords)
        # 122 atoms -> device: differs from the float64 host trajectory
        atoms_l, coords_l = out[1]
        _, h_l = builtin_smi2coords("C" * 40, seed=42)
        assert atoms_l == [*["C"] * 40, *["H"] * 82]
        assert not np.array_equal(coords_l, h_l)

    def test_native_terms_bit_exact(self):
        """mmchem_terms (C++ ABI v3) must reproduce the Python term builder
        exactly — both feed the same device refinement."""
        from mmdti_tpu.chem import native
        from mmdti_tpu.chem.conformer import _bond_angle_terms

        if not native.terms_available():
            pytest.skip("libmmchem.so not built (make -C csrc)")
        for smi in ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
                    "C#CC=CC1CC1N(C)C", "B(O)(O)c1ccccc1", "C1CC1.CCO"]:
            mol = parse_smiles(smi).add_hydrogens()
            nb_, nl_, na_, al_ = native.bond_angle_terms(mol)
            pb, pl, pa, pal, _ = _bond_angle_terms(mol)
            np.testing.assert_array_equal(nb_, pb, err_msg=smi)
            np.testing.assert_array_equal(nl_, pl, err_msg=smi)
            np.testing.assert_array_equal(na_, pa, err_msg=smi)
            np.testing.assert_array_equal(al_, pal, err_msg=smi)

    def test_native_parse_bit_exact(self):
        """mmchem_parse (C++ ABI v4) must reproduce
        parse_smiles(s).add_hydrogens() exactly: atom order, symbols,
        aromatic/boron flags, bond list and orders — and reject exactly the
        strings the Python parser rejects."""
        from mmdti_tpu.chem import native

        if not native.parse_available():
            pytest.skip("libmmchem.so ABI v4 not built (make -C csrc)")
        corpus = [
            "CCO", "CC(=O)O", "c1ccccc1", "c1ccncc1", "C1CCCCC1",
            "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1", "c1ccsc1", "c1ccoc1",
            "c1cc[nH]c1", "[O-]C(=O)C", "[NH4+]", "[13CH4]",
            "C[C@H](N)C(=O)O", "[Se]1C=CC=C1", "B(O)(O)c1ccccc1",
            "C/C=C/C", "C1CC1.CCO", "C%10CCCCC%10", "O=S(=O)(O)O",
            "CP(=O)(O)O", "[Na+].[Cl-]", "c1ccc(-c2ccccc2)cc1",
            "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "COc1cc2c(cc1OC)CCN=C2",
            "CC1=CC(=O)C=CC1=O", "[nH]1cccc1", "s1cccc1",
            "FC(F)(F)c1ccccc1", "N#Cc1ccccc1",
        ]
        for smi in corpus:
            mol = parse_smiles(smi).add_hydrogens()
            nat = native.parse_graph(smi)
            assert nat is not None, smi
            syms, flags, bonds, orders = nat
            assert syms == [a.symbol for a in mol.atoms], smi
            np.testing.assert_array_equal(
                flags,
                [(1 if a.aromatic else 0) | (2 if a.symbol == "B" else 0)
                 for a in mol.atoms], err_msg=smi)
            np.testing.assert_array_equal(
                bonds, np.array([[b.a1, b.a2] for b in mol.bonds]
                                ).reshape(-1, 2), err_msg=smi)
            np.testing.assert_array_equal(
                orders, [b.order for b in mol.bonds], err_msg=smi)
        for smi in ["", "C(", "C)", "C1CC", "Cl)", "[Xx]", "C%1CC", "C==C",
                    "[C", "&", "Zn", "C..C", "=C", "1CC"]:
            try:
                parse_smiles(smi)
                py_ok = True
            except Exception:
                py_ok = False
            assert py_ok == (native.parse_graph(smi) is not None), smi

    def test_native_parse_fuzz_against_python(self):
        """Randomly generated strings over the SMILES alphabet: native and
        Python parsers must agree on acceptance, and on the full graph for
        every accepted string."""
        from mmdti_tpu.chem import native

        if not native.parse_available():
            pytest.skip("libmmchem.so ABI v4 not built (make -C csrc)")
        rng = np.random.RandomState(0)
        alphabet = list("CCCNOSPcnos()[]=#-+123@Hl BrF/\\%.*")
        accepted = 0
        for _ in range(500):
            n = rng.randint(1, 24)
            smi = "".join(rng.choice(alphabet) for _ in range(n))
            try:
                mol = parse_smiles(smi).add_hydrogens()
            except Exception:
                mol = None
            nat = native.parse_graph(smi)
            if mol is None:
                assert nat is None, f"native accepted {smi!r}"
                continue
            assert nat is not None, f"native rejected {smi!r}"
            accepted += 1
            syms, flags, bonds, orders = nat
            assert syms == [a.symbol for a in mol.atoms], smi
            np.testing.assert_array_equal(
                bonds, np.array([[b.a1, b.a2] for b in mol.bonds]
                                ).reshape(-1, 2), err_msg=smi)
            np.testing.assert_array_equal(
                orders, [b.order for b in mol.bonds], err_msg=smi)
        assert accepted >= 10, f"fuzz corpus too weak ({accepted} accepted)"

    def test_feature_dict_contract(self):
        """Device-provider features have the exact molecule-path schema."""
        gen = ConformerGen(coord_provider="device", seed=42)
        feats = gen.transform(["CCO"])
        f = feats[0]
        assert set(f) == {"src_tokens", "src_distance", "src_coord", "src_edge_type"}
        n = len(f["src_tokens"])
        assert f["src_distance"].shape == (n, n)
        assert f["src_coord"].shape == (n, 3)
        # BOS/EOS rows zeroed, centered interior
        assert (f["src_coord"][0] == 0).all() and (f["src_coord"][-1] == 0).all()
        np.testing.assert_allclose(f["src_coord"][1:-1].mean(0), 0.0, atol=1e-5)
