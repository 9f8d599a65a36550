"""Chem stack unit tests: parser, scaffolds, conformers, featurizer, tokenizer."""

import numpy as np
import pytest

from mmdti_tpu.chem import (
    Dictionary,
    SmilesTokenizer,
    coords2unimol,
    is_valid_smiles,
    murcko_scaffold,
    parse_smiles,
    smi2coords,
)


class TestParser:
    @pytest.mark.parametrize(
        "smi,n_heavy,n_h",
        [
            ("CCO", 3, 6),                       # ethanol C2H6O
            ("c1ccccc1", 6, 6),                  # benzene
            ("CC(=O)Oc1ccccc1C(=O)O", 13, 8),    # aspirin C9H8O4
            ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 15, 18),  # ibuprofen C13H18O2
            ("N#Cc1ccccc1", 8, 5),               # benzonitrile C7H5N
            ("O=C1CCCCC1", 7, 10),               # cyclohexanone C6H10O
            ("[NH4+]", 1, 4),
            ("C[N+](C)(C)C", 5, 12),             # tetramethylammonium
        ],
    )
    def test_atom_and_h_counts(self, smi, n_heavy, n_h):
        mol = parse_smiles(smi)
        assert mol.num_atoms() == n_heavy
        assert sum(mol.implicit_h(i) for i in range(mol.num_atoms())) == n_h

    @pytest.mark.parametrize("bad", ["C1CC", "C((C)", "XxYy", "", "C)", "[Qq]", "C%1"])
    def test_invalid(self, bad):
        assert not is_valid_smiles(bad)

    def test_ring_perception(self):
        mol = parse_smiles("Cc1ccccc1")  # toluene: 6 ring atoms + 1 methyl
        assert sum(a.in_ring for a in mol.atoms) == 6

    def test_add_hydrogens(self):
        mol = parse_smiles("CCO").add_hydrogens()
        assert mol.num_atoms() == 9
        assert sum(1 for a in mol.atoms if a.symbol == "H") == 6

    def test_disconnected(self):
        mol = parse_smiles("[Na+].[Cl-]")
        assert mol.num_atoms() == 2 and len(mol.bonds) == 0


class TestScaffold:
    def test_grouping(self):
        # substituted benzenes share a scaffold
        assert murcko_scaffold("c1ccccc1") == murcko_scaffold("Cc1ccccc1")
        assert murcko_scaffold("c1ccccc1") == murcko_scaffold("CCCc1ccccc1")
        # different ring systems differ
        assert murcko_scaffold("c1ccccc1") != murcko_scaffold("C1CCCCC1")
        assert murcko_scaffold("c1ccccc1") != murcko_scaffold("c1ccncc1")

    def test_acyclic_empty(self):
        assert murcko_scaffold("CCO") == ""

    def test_invalid_returns_input(self):
        assert murcko_scaffold("NOT_A_SMILES((") == "NOT_A_SMILES(("


class TestConformer:
    def test_deterministic(self):
        a1, c1 = smi2coords("CC(=O)Oc1ccccc1C(=O)O", seed=42)
        a2, c2 = smi2coords("CC(=O)Oc1ccccc1C(=O)O", seed=42)
        assert a1 == a2
        np.testing.assert_allclose(c1, c2)

    def test_seed_changes_coords(self):
        _, c1 = smi2coords("CCO", seed=1)
        _, c2 = smi2coords("CCO", seed=2)
        assert not np.allclose(c1, c2)

    def test_bond_lengths_reasonable(self):
        atoms, coords = smi2coords("CCO", seed=42)
        # heavy atoms come first (C,C,O), bonds C-C then C-O
        d_cc = np.linalg.norm(coords[0] - coords[1])
        d_co = np.linalg.norm(coords[1] - coords[2])
        assert 1.3 < d_cc < 1.75
        assert 1.2 < d_co < 1.65

    def test_remove_hs(self):
        atoms, coords = smi2coords("CCO", seed=42, remove_hs=True)
        assert atoms == ["C", "C", "O"]
        assert coords.shape == (3, 3)


class TestFeaturizer:
    def setup_method(self):
        self.dictionary = Dictionary.load()
        self.dictionary.add_symbol("[MASK]", is_special=True)

    def test_layout(self):
        atoms, coords = smi2coords("CCO", seed=42)
        feat = coords2unimol(atoms, coords, self.dictionary)
        n = len(atoms) + 2
        assert feat["src_tokens"].shape == (n,)
        assert feat["src_tokens"][0] == self.dictionary.bos()
        assert feat["src_tokens"][-1] == self.dictionary.eos()
        assert feat["src_distance"].shape == (n, n)
        assert feat["src_coord"].shape == (n, 3)
        assert feat["src_edge_type"].shape == (n, n)

    def test_distance_matrix_properties(self):
        atoms, coords = smi2coords("c1ccccc1", seed=42)
        feat = coords2unimol(atoms, coords, self.dictionary)
        d = feat["src_distance"]
        np.testing.assert_allclose(d, d.T, atol=1e-5)
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)
        # coords centered: heavy+H centroid at origin (excluding bos/eos rows)
        np.testing.assert_allclose(feat["src_coord"][1:-1].mean(0), 0.0, atol=1e-4)

    def test_edge_types(self):
        atoms, coords = smi2coords("CCO", seed=42)
        feat = coords2unimol(atoms, coords, self.dictionary)
        v = len(self.dictionary)
        t = feat["src_tokens"]
        np.testing.assert_array_equal(
            feat["src_edge_type"], t.reshape(-1, 1) * v + t.reshape(1, -1)
        )

    def test_max_atoms_crop(self):
        atoms = ["C"] * 300
        coords = np.random.RandomState(0).randn(300, 3).astype(np.float32)
        feat = coords2unimol(atoms, coords, self.dictionary, max_atoms=256,
                             crop_rng=np.random.RandomState(0))
        assert feat["src_tokens"].shape == (258,)


class TestNativeParity:
    def test_cpp_matches_numpy(self):
        from mmdti_tpu.chem import native
        from mmdti_tpu.chem.conformer import _build_terms, _refine

        if not native.available():
            import shutil
            if shutil.which("g++") or shutil.which("cc"):
                pytest.fail(
                    "libmmchem.so unavailable although a C++ compiler exists — "
                    "conftest's `make -C csrc` build failed; run it manually"
                )
            pytest.skip("libmmchem.so not built and no compiler available")
        mol = parse_smiles("CC(=O)Oc1ccccc1C(=O)O").add_hydrogens()
        rng = np.random.RandomState(0)
        c0 = (rng.randn(mol.num_atoms(), 3) * 3).astype(np.float32)
        ours = _refine(c0.copy(), _build_terms(mol))
        theirs = native.refine_coords(mol, c0.copy())
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_out_of_range_indices_rejected_not_crash(self):
        """The ABI boundary validates pair indices: a caller bug that ships
        an out-of-range atom index must come back as a nonzero rc (the
        binding degrades to numpy), never an out-of-bounds write."""
        import ctypes

        from mmdti_tpu.chem import native

        lib = native._lib()
        if lib is None:
            pytest.skip("libmmchem.so not built")
        n = 4
        x = np.zeros((n, 3), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        for bad in (np.array([[0, n]], np.int32), np.array([[-1, 1]], np.int32)):
            bidx = np.ascontiguousarray(bad)
            blen = np.ones((1,), np.float32)
            rc = lib.mmchem_refine(
                n, x.ctypes.data_as(fp),
                1, bidx.ctypes.data_as(ip), blen.ctypes.data_as(fp),
                0, None, None, 0, None, 10,
            )
            assert rc != 0

    def test_cpp_embed_matches_numpy(self):
        """The combined graph->terms->refine entry (mmchem_embed) must
        reproduce the Python term builder exactly: theta rules (sp linear,
        aromatic/double/boron 120-degree, else tetrahedral), 1-3 dedup that
        keeps angle terms on 3-ring closure bonds, and cross-fragment
        nonbonded pairs."""
        import shutil

        from mmdti_tpu.chem import native
        from mmdti_tpu.chem.conformer import _build_terms, _refine

        if not native.available():
            if shutil.which("g++") or shutil.which("cc"):
                pytest.fail(
                    "libmmchem.so unavailable although a C++ compiler exists — "
                    "conftest's `make -C csrc` build failed; run it manually"
                )
            pytest.skip("libmmchem.so not built and no compiler available")
        if not native.embed_available():
            # A supported compat config: an old MMCHEM_LIB build without the
            # v2 embed entry degrades to the refine/numpy ladder.
            pytest.skip("loaded libmmchem.so predates the mmchem_embed v2 ABI")
        for smi in [
            "CC(=O)Oc1ccccc1C(=O)O",  # aromatic + carbonyls
            "C#N",                    # sp linear
            "[Na+].[Cl-]",            # two fragments, no bonds
            "B(O)(O)c1ccccc1",        # boron 120-degree rule
            "C1CC1",                  # 3-ring: bonded pairs keep angle terms
            "O=C=O",                  # cumulated double bonds -> linear
        ]:
            mol = parse_smiles(smi).add_hydrogens()
            rng = np.random.RandomState(0)
            c0 = (rng.randn(mol.num_atoms(), 3) * 3).astype(np.float32)
            ours = _refine(c0.copy(), _build_terms(mol))
            theirs = native.embed_coords(mol, c0.copy())
            assert theirs is not None, smi
            np.testing.assert_allclose(ours, theirs, atol=1e-4, err_msg=smi)

    def test_cpp_embed_matches_numpy_large_molecule(self):
        """Large molecules take the C++ refine's Verlet-pruned nonbonded
        path (engaged above ~2k nonbonded pairs): pairs beyond the repulsion
        floor + margin are skipped between list rebuilds, which must stay
        BIT-identical to the full enumeration (far pairs contribute exactly
        zero).  Small-molecule cases above never reach that branch."""
        from mmdti_tpu.chem import native
        from mmdti_tpu.chem.conformer import _build_terms, _refine

        if not (native.available() and native.embed_available()):
            pytest.skip("native embed unavailable (covered by the test above)")
        # 51 heavy atoms -> ~150 with H -> ~10k nonbonded pairs
        smi = "C" * 20 + "O" + "C" * 15 + "O" + "C" * 14
        mol = parse_smiles(smi).add_hydrogens()
        terms = _build_terms(mol)
        assert len(terms[4]) >= 2048, "expected the pruned-refine regime"
        rng = np.random.RandomState(0)
        n = mol.num_atoms()
        c0 = (rng.randn(n, 3) * max(1.5, 0.8 * n ** (1 / 3) * 2)).astype(np.float32)
        ours = _refine(c0.copy(), terms)
        theirs = native.embed_coords(mol, c0.copy())
        assert theirs is not None
        np.testing.assert_array_equal(ours, theirs)


class TestThreadedTransform:
    def test_pool_matches_serial_and_preserves_order(self):
        """num_workers>1 routes transform through a thread pool (the C++
        refine/distance calls release the GIL); results must be identical to
        the serial path and in input order."""
        from mmdti_tpu.chem.conformer import ConformerGen

        smis = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
                "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "CCN(CC)CC", "O=C=O"]
        serial = ConformerGen().transform(smis)
        pooled = ConformerGen(num_workers=3).transform(smis)
        assert len(serial) == len(pooled) == len(smis)
        for i, (a, b) in enumerate(zip(serial, pooled)):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{smis[i]}/{k}")


class TestTokenizer:
    def test_roundtrippable_tokens(self):
        tok = SmilesTokenizer()
        for smi in ["CCO", "c1ccc(Cl)cc1", "C[C@H](N)C(=O)O", "CC(=O)Oc1ccccc1C(=O)O"]:
            assert "".join(tok.tokenize(smi)) == smi

    def test_batch_contract(self):
        tok = SmilesTokenizer()
        out = tok(["CCO", "c1ccccc1CCCC"], pad_to=32)
        assert out["input_ids"].shape == (2, 32)
        assert out["attention_mask"].shape == (2, 32)
        assert out["input_ids"][0, 0] == tok.bos_token_id
        assert (out["input_ids"][out["attention_mask"] == 0] == tok.pad_token_id).all()

    def test_deterministic_vocab(self):
        assert SmilesTokenizer().vocab == SmilesTokenizer().vocab


class TestParserEdgeCases:
    def test_percent_ring_closures(self):
        from mmdti_tpu.chem import parse_smiles

        mol = parse_smiles("C%10CCCCC%10")  # cyclohexane via %nn
        assert sum(a.in_ring for a in mol.atoms) == 6

    def test_isotopes_and_charges(self):
        from mmdti_tpu.chem import parse_smiles

        mol = parse_smiles("[13CH3][N+](C)(C)C.[Cl-]")
        assert mol.atoms[0].isotope == 13
        assert mol.atoms[1].charge == 1
        assert mol.atoms[-1].charge == -1

    def test_nested_branches(self):
        from mmdti_tpu.chem import parse_smiles

        mol = parse_smiles("CC(C(C)(C)C)C(=O)O")
        assert mol.num_atoms() == 9

    def test_directional_bonds_parse_as_single(self):
        from mmdti_tpu.chem import parse_smiles

        mol = parse_smiles("C/C=C/C")
        orders = sorted(b.order for b in mol.bonds)
        assert orders == [1.0, 1.0, 2.0]

    def test_divalent_aromatic_heteroatoms_get_no_h(self):
        """Thiophene's s / furan's o have their valence filled by the two
        ring bonds — RDKit adds no H there (the old 1.5-per-bond rule handed
        thiophene a phantom H: 10 atoms instead of 9)."""
        from mmdti_tpu.chem import parse_smiles

        assert parse_smiles("c1ccsc1").add_hydrogens().num_atoms() == 9
        assert parse_smiles("c1ccoc1").add_hydrogens().num_atoms() == 9
        # aromatic C/N rules unchanged
        assert parse_smiles("c1ccccc1").add_hydrogens().num_atoms() == 12
        assert parse_smiles("c1ccncc1").add_hydrogens().num_atoms() == 11

    def test_dangling_bond_symbols_rejected(self):
        """RDKit rejects all of these; silently dropping the bond symbol
        (the old behavior for 'C=(C)C') produced a wrong structure."""
        import pytest as _pytest

        from mmdti_tpu.chem import parse_smiles
        from mmdti_tpu.chem.smiles import SmilesError

        for bad in ("C=", "C=(C)C", "C.=C", "=CC", "C(C=)O"):
            with _pytest.raises(SmilesError):
                parse_smiles(bad)
        # ring-closure bond orders still parse
        m = parse_smiles("C=1CC=1")
        assert sorted(b.order for b in m.bonds) == [1.0, 1.0, 2.0]

    def test_tokenizer_cache_respects_truncation(self):
        from mmdti_tpu.chem.tokenizer import SmilesTokenizer

        tok = SmilesTokenizer(max_len=8)
        long = "C" * 40
        full = tok.encode(long, truncation=False)
        trunc = tok.encode(long, truncation=True)
        assert len(full) > 8 and len(trunc) == 8

    def test_explicit_missing_dict_path_raises(self, tmp_path):
        from mmdti_tpu.chem.dictionary import Dictionary

        with pytest.raises(FileNotFoundError):
            Dictionary.load(str(tmp_path / "nope.dict.txt"))
        assert len(Dictionary.load(None)) > 0  # default path still works


class TestParserFuzz:
    def test_never_crashes_only_smileserror(self):
        """Adversarial byte soup: the parser must either return a Molecule or
        raise SmilesError (a ValueError) — never IndexError/KeyError/
        RecursionError/hang.  Serving feeds it untrusted client strings."""
        import itertools
        import random

        from mmdti_tpu.chem import parse_smiles
        from mmdti_tpu.chem.smiles import SmilesError

        rng = random.Random(0)
        alphabet = "CNOSPFclnos()[]=#+-@/\\%123456789Hh.*Br"
        cases = ["".join(rng.choices(alphabet, k=rng.randint(1, 30)))
                 for _ in range(300)]
        # targeted nasties: unbalanced constructs, dangling ring bonds,
        # empty/whitespace, huge ring indices, lone brackets
        cases += [
            "", " ", "(", ")", "((((", "C(", "C)", "[", "]", "[C", "C]",
            "C1", "C%", "C%1", "C%999", "C=", "C#", "C.", ".", "C..C",
            "[]", "[+]", "[13]", "C//C", "%%", "1C", "=C", "#", "C1CC2",
            "[Zz]", "c1ccccc1(", "C" * 500,
        ]
        for s in cases:
            try:
                mol = parse_smiles(s)
                assert mol.num_atoms() >= 0
            except SmilesError:
                pass  # the one allowed failure mode

    def test_parse_then_featurize_fuzz(self):
        """Strings that parse must also survive the full featurization path
        (hydrogens, terms, coordinates) without crashing."""
        import random

        from mmdti_tpu.chem import parse_smiles
        from mmdti_tpu.chem.conformer import smi2coords
        from mmdti_tpu.chem.smiles import SmilesError

        rng = random.Random(1)
        alphabet = "CNOScno()=#123[]+-H"
        survived = 0
        for _ in range(120):
            s = "".join(rng.choices(alphabet, k=rng.randint(1, 20)))
            try:
                parse_smiles(s)
            except SmilesError:
                continue
            atoms, coords = smi2coords(s, seed=0)
            assert len(atoms) == len(coords)
            assert np.isfinite(coords).all()
            survived += 1
        assert survived > 0  # the corpus must exercise the success path


class TestConformerGolden:
    def test_energy_model_stability(self):
        """Golden digest guards accidental changes to the conformer energy
        model (which would silently invalidate feature caches)."""
        import hashlib

        atoms, coords = smi2coords("CC(=O)Oc1ccccc1C(=O)O", seed=42)
        digest = hashlib.sha1(np.round(coords, 4).tobytes()).hexdigest()[:12]
        assert digest == "57ca47501619", digest
