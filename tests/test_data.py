"""Data layer tests: reader, scaler, weights, collation, splits."""

import numpy as np
import pandas as pd
import pytest

from mmdti_tpu.chem import SmilesTokenizer
from mmdti_tpu.data import (
    BatchCollator,
    MolDataLoader,
    MolDataReader,
    MolDataset,
    TargetScaler,
    calculate_weights,
    compute_sample_weights,
)
from mmdti_tpu.splits import Splitter, random_scaffold_split, random_split


class TestReader:
    def test_explicit_target_cols(self, tmp_path):
        df = pd.DataFrame({"smiles": ["CCO", "CCC"], "y": [1.0, 2.0]})
        p = tmp_path / "d.csv"
        df.to_csv(p, index=False)
        out = MolDataReader().read_data(str(p), True, task="regression",
                                        target_cols=["y"], smiles_col="smiles")
        assert out["target_cols"] == ["y"]
        assert out["raw_target"] == [[1.0], [2.0]]
        assert out["num_classes"] == 1

    def test_prefix_discovery(self):
        data = pd.DataFrame({"SMILES": ["CCO"], "TARGET_a": [1.0], "TARGET_b": [2.0]})
        out = MolDataReader().read_data(data, True, task="multilabel_regression")
        assert out["target_cols"] == ["TARGET_a", "TARGET_b"]

    def test_predict_placeholder(self):
        data = pd.DataFrame({"SMILES": ["CCO", "CCC"]})
        out = MolDataReader().read_data(data, False, task="regression", target_cols=["y"])
        assert (np.asarray(out["raw_target"]) == -1.0).all()

    def test_anomaly_clean(self):
        vals = list(np.ones(50)) + [1000.0]
        data = pd.DataFrame({"SMILES": ["CCO"] * 51, "y": vals})
        out = MolDataReader().read_data(data, True, task="regression",
                                        target_cols=["y"], anomaly_clean=True)
        assert len(out["raw_target"]) == 50

    def test_invalid_smiles_filtered_keeps_alignment(self):
        data = pd.DataFrame({"SMILES": ["CCO", "BAD((", "CCC"], "y": [1.0, 2.0, 3.0]})
        out = MolDataReader().read_data(data, True, task="regression", target_cols=["y"])
        assert out["smiles"] == ["CCO", "CCC"]
        assert out["raw_target"] == [[1.0], [3.0]]

    def test_dict_input(self):
        out = MolDataReader().read_data(
            {"SMILES": ["CCO", "CCC"], "target": [0, 1]}, True, task="classification"
        )
        assert out["target_cols"] == ["TARGET"]


class TestScaler:
    def test_standard_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        y = rng.randn(100, 1) * 3 + 5
        sc = TargetScaler("standard", "regression")
        sc.fit(y, str(tmp_path))
        z = sc.transform(y)
        np.testing.assert_allclose(z.mean(), 0, atol=1e-7)
        np.testing.assert_allclose(sc.inverse_transform(z), y, atol=1e-6)

    def test_auto_selects_standard_for_normal(self):
        from sklearn.preprocessing import StandardScaler

        y = np.random.RandomState(0).randn(500, 1)
        sc = TargetScaler("auto", "regression")
        sc.fit(y)
        assert isinstance(sc.scaler, StandardScaler)

    def test_auto_selects_robust_for_skewed(self):
        from sklearn.preprocessing import RobustScaler

        rng = np.random.RandomState(0)
        y = np.concatenate([rng.randn(500), rng.randn(5) * 1000]).reshape(-1, 1)
        sc = TargetScaler("auto", "regression")
        sc.fit(y)
        assert isinstance(sc.scaler, RobustScaler)

    def test_persistence(self, tmp_path):
        y = np.random.RandomState(0).randn(50, 1)
        sc = TargetScaler("standard", "regression")
        sc.fit(y, str(tmp_path))
        sc2 = TargetScaler("standard", "regression", load_dir=str(tmp_path))
        np.testing.assert_allclose(sc2.transform(y), sc.transform(y))

    def test_classification_passthrough(self):
        y = np.array([[0], [1]])
        sc = TargetScaler("standard", "classification")
        sc.fit(y)
        np.testing.assert_array_equal(sc.transform(y), y)

    def test_multilabel_nan_handling(self):
        y = np.array([[1.0, np.nan], [2.0, 4.0], [3.0, 6.0]])
        sc = TargetScaler("standard", "multilabel_regression")
        sc.fit(y)
        z = sc.transform(y)
        assert np.isfinite(z[:, 0]).all()


class TestWeights:
    def test_mean_one_normalization(self):
        y = np.random.RandomState(0).randn(200)
        w = calculate_weights(y, max_bin=50)
        assert w.shape == (200,)
        np.testing.assert_allclose(w.mean(), 1.0, atol=1e-5)

    def test_rare_labels_upweighted(self):
        rng = np.random.RandomState(0)
        y = np.concatenate([rng.normal(0, 0.1, 95), rng.normal(1.0, 0.05, 5)])
        w = calculate_weights(y, max_bin=10)
        assert w[-5:].mean() > w[:95].mean()

    def test_all_weight_shape(self):
        y = np.random.RandomState(0).randn(100, 3)
        w = compute_sample_weights(y, all_weight=True)
        assert w.shape == (100, 3)

    def test_lds_runs(self):
        y = np.random.RandomState(0).randn(100)
        w = calculate_weights(y, max_bin=20, lds=True)
        assert np.isfinite(w).all()

    def test_lds_kernel_knobs_plumb_through(self):
        """lds kernel/ks/sigma reach the smoothing window (VERDICT r1 #7;
        reference lds_config, data/datahub.py:24-29)."""
        y = np.concatenate([
            np.random.RandomState(0).normal(0, 0.1, 90),
            np.random.RandomState(1).normal(2.0, 0.05, 10),
        ]).reshape(-1, 1)
        w_gauss = compute_sample_weights(y, lds=True, max_bin=20)
        w_triang = compute_sample_weights(
            y, lds=True, max_bin=20, lds_kernel="triang", lds_ks=5
        )
        w_wide = compute_sample_weights(y, lds=True, max_bin=20, lds_sigma=4.0)
        assert np.isfinite(w_triang).all() and np.isfinite(w_wide).all()
        assert not np.allclose(w_gauss, w_triang)
        assert not np.allclose(w_gauss, w_wide)


class TestConformerCacheKey:
    def test_cache_invalidates_on_featurizer_param_change(self, tmp_path):
        """Changing remove_hs/seed must not reuse a stale cache (VERDICT r1 #9)."""
        import pandas as pd
        from mmdti_tpu.data.hub import DataHub

        csv = tmp_path / "d.csv"
        pd.DataFrame({"smiles": ["CCO", "CCCC", "c1ccccc1"],
                      "measured": [0.1, 0.2, 0.3]}).to_csv(csv, index=False)
        cache = str(tmp_path / "conf.pkl")
        common = dict(
            data=str(csv), is_train=True, task="regression", use_scaler=False,
            target_cols=["measured"], smiles_col="smiles", cache_dir_train=cache,
        )
        h1 = DataHub(**common, remove_hs=False)
        n_with_h = len(h1.data["unimol_input"][0]["src_tokens"])
        h2 = DataHub(**common, remove_hs=True)  # must NOT hit the stale cache
        n_no_h = len(h2.data["unimol_input"][0]["src_tokens"])
        assert n_no_h < n_with_h  # hydrogens actually removed
        h3 = DataHub(**common, remove_hs=True)  # same params: cache hit OK
        assert len(h3.data["unimol_input"][0]["src_tokens"]) == n_no_h

    def test_cache_invalidates_on_pair_feats_change(self, tmp_path):
        """A cache built WITHOUT host pair arrays (pair_feats=False,
        device-side reconstruction) must not be served to a host-pair-feats
        consumer — its entries have no src_distance/src_edge_type at all."""
        import pandas as pd
        from mmdti_tpu.data.hub import DataHub

        csv = tmp_path / "d.csv"
        pd.DataFrame({"smiles": ["CCO", "CCCC"],
                      "measured": [0.1, 0.2]}).to_csv(csv, index=False)
        cache = str(tmp_path / "conf.pkl")
        common = dict(
            data=str(csv), is_train=True, task="regression", use_scaler=False,
            target_cols=["measured"], smiles_col="smiles", cache_dir_train=cache,
        )
        h1 = DataHub(**common, pair_feats=False)
        assert "src_distance" not in h1.data["unimol_input"][0]
        h2 = DataHub(**common)  # host pair feats: must NOT hit that cache
        assert "src_distance" in h2.data["unimol_input"][0]


class TestCollation:
    def _features(self, n=6):
        rng = np.random.RandomState(0)
        feats = []
        for i in range(n):
            k = rng.randint(4, 10)
            feats.append({
                "src_tokens": np.concatenate([[0], rng.randint(4, 20, k), [2]]),
                "src_distance": rng.rand(k + 2, k + 2).astype(np.float32),
                "src_edge_type": rng.randint(0, 100, (k + 2, k + 2)),
                "src_coord": rng.randn(k + 2, 3).astype(np.float32),
                "smile": "CCO" if i % 2 else "c1ccccc1",
                "weights": np.float32(1.0),
            })
        return feats

    def test_static_shapes(self):
        feats = self._features()
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.zeros((len(feats), 1)))
        shapes = set()
        for batch, labels in MolDataLoader(ds, 2, coll):
            shapes.add(batch["src_tokens"].shape + batch["input_ids"].shape)
            assert batch["src_distance"].shape == (2, 16, 16)
        assert len(shapes) == 1

    def test_drop_last_and_shuffle_determinism(self):
        feats = self._features(7)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.arange(7).reshape(-1, 1))
        dl = MolDataLoader(ds, 2, coll, shuffle=True, drop_last=True, seed=0)
        assert len(dl) == 3
        order1 = [labels.tolist() for _, labels in MolDataLoader(ds, 2, coll, shuffle=True, seed=5)]
        order2 = [labels.tolist() for _, labels in MolDataLoader(ds, 2, coll, shuffle=True, seed=5)]
        assert order1 == order2

    def test_epoch_index_matrix_matches_iter(self):
        """Device-feed batch composition must equal the loader's (same RNG
        stream), across multiple epochs."""
        feats = self._features(7)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.arange(7).reshape(-1, 1))
        dl_iter = MolDataLoader(ds, 2, coll, shuffle=True, drop_last=True, seed=3)
        dl_idx = MolDataLoader(ds, 2, coll, shuffle=True, drop_last=True, seed=3)
        for _ in range(3):  # RNG advances identically epoch over epoch
            iter_labels = [labels[:, 0].tolist() for _, labels in dl_iter]
            idx_mat, valid_ns = dl_idx.epoch_index_matrix()
            assert idx_mat.shape == (3, 2) and valid_ns == [2, 2, 2]
            assert [ds.labels[row, 0].tolist() for row in idx_mat] == iter_labels

    def test_advance_epochs_aligns_resumed_stream(self):
        """advance_epochs(n) must put a fresh loader exactly where an
        uninterrupted loader would be after n epochs (resume alignment)."""
        feats = self._features(7)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.arange(7).reshape(-1, 1))
        full = MolDataLoader(ds, 2, coll, shuffle=True, drop_last=True, seed=9)
        for _ in range(2):
            list(full)
        expected, _ = full.epoch_index_matrix()
        resumed = MolDataLoader(ds, 2, coll, shuffle=True, drop_last=True, seed=9)
        resumed.advance_epochs(2)
        got, _ = resumed.epoch_index_matrix()
        assert got.tolist() == expected.tolist()
        assert MolDataLoader(ds, 2, coll, shuffle=True, seed=9).epoch_index_matrix()[0].tolist() != expected.tolist()

    def test_epoch_index_matrix_pads_partial_tail(self):
        """Without drop_last the tail batch repeats its last index — the
        index-level twin of Trainer._pad_to_batch."""
        feats = self._features(5)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.arange(5).reshape(-1, 1))
        idx_mat, valid_ns = MolDataLoader(ds, 2, coll).epoch_index_matrix()
        assert idx_mat.shape == (3, 2) and valid_ns == [2, 2, 1]
        assert idx_mat[-1].tolist() == [4, 4]

    def test_collate_dataset_matches_batched_collation(self):
        from mmdti_tpu.data.batching import collate_dataset

        feats = self._features(6)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="dataset",
                             atom_pad=16, smiles_pad=24)
        ds = MolDataset(feats, np.arange(6).reshape(-1, 1))
        full, labels = collate_dataset(ds, coll, chunk=4)  # forces 2 chunks
        per_batch = list(MolDataLoader(ds, 2, coll))
        for k in full:
            want = np.concatenate([b[0][k] for b in per_batch])
            np.testing.assert_array_equal(full[k], want)
        np.testing.assert_array_equal(
            labels, np.concatenate([b[1] for b in per_batch])
        )

    def test_collate_dataset_rejects_nonstatic_padding(self):
        from mmdti_tpu.data.batching import collate_dataset

        feats = self._features(4)
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="ragged")
        ds = MolDataset(feats, np.zeros((4, 1)))
        with pytest.raises(ValueError, match="static pad_mode"):
            collate_dataset(ds, coll)


class TestDatasetPadLengths:
    def test_truncation_bounds_smiles_pad(self):
        """A pathological long SMILES must not inflate the compiled batch
        shape past what encode() (which truncates to max_len) will emit."""
        from mmdti_tpu.chem.tokenizer import SmilesTokenizer
        from mmdti_tpu.data.batching import dataset_pad_lengths

        tok = SmilesTokenizer(max_len=16)
        feats = [
            {"src_tokens": np.zeros(5), "smile": "CCO"},
            {"src_tokens": np.zeros(7), "smile": "C" * 400},  # >> max_len tokens
        ]
        atom, smi = dataset_pad_lengths(feats, tok, pad_multiple=8)
        assert atom == 8
        assert smi <= 16  # truncated length, rounded to pad_multiple
        # encode() output always fits the computed pad
        assert len(tok.encode("C" * 400)) <= smi


class TestSplits:
    def _df(self, n=40):
        # many small scaffold buckets so the greedy fill can populate test/valid
        base = [
            "c1ccccc1", "C1CCCCC1", "c1ccncc1", "c1ccc2ccccc2c1", "C1CCNCC1",
            "c1ccoc1", "c1ccsc1", "C1CCOC1", "c1cncnc1", "C1CC1",
            "C1CCC1", "C1CCCC1", "c1cnccn1", "C1CCNC1", "c1cc[nH]c1",
            "C1COCCN1", "c1ccc2[nH]ccc2c1", "C1CCOCC1", "c1cscn1", "C1CNCCN1",
        ]
        rng = np.random.RandomState(0)
        return pd.DataFrame({
            "smiles": [f"{'C' * (i // len(base))}{base[i % len(base)]}" for i in range(n)],
            "y": rng.randn(n),
        })

    def test_scaffold_split_invariants(self):
        df = self._df()
        tr, va, te = random_scaffold_split(df, random_seed=0)
        assert len(tr) + len(va) + len(te) == len(df)
        assert not set(tr.index) & set(te.index)
        assert not set(tr.index) & set(va.index)

    def test_scaffold_split_seed_dependence(self):
        df = self._df()
        te0 = random_scaffold_split(df, random_seed=0)[2]
        te1 = random_scaffold_split(df, random_seed=1)[2]
        assert len(te0) and len(te1)

    def test_random_split(self):
        df = self._df()
        tr, va, te = random_split(df, random_seed=0)
        assert len(tr) + len(va) + len(te) == len(df)

    def test_kfold_splitter(self):
        df = self._df()
        sp = Splitter("5fold_random", seed=42)
        folds = list(sp.split(df))
        assert len(folds) == 5
        with pytest.raises(ValueError):
            Splitter("5fold_bogus")

    def test_split_error_keeps_real_diagnosis(self):
        """A failure inside a KNOWN method (e.g. scaffold split without
        groups) must surface sklearn's actual complaint, not a misleading
        'unknown method' label."""
        df = self._df()
        sp = Splitter("5fold_scaffold", seed=42)
        with pytest.raises(ValueError) as ei:
            sp.split(df)  # no group= -> GroupKFold complains at iteration,
            # which split() now does inside its try (it returns a list)
        msg = str(ei.value)
        assert "split failed" in msg  # the wrapper actually fired
        assert "groups" in msg  # ...and kept sklearn's diagnosis


class TestBucketCollation:
    def test_bucket_shapes_limited(self):
        from mmdti_tpu.chem import SmilesTokenizer

        rng = np.random.RandomState(0)
        feats = []
        for i in range(12):
            k = rng.randint(4, 40)
            feats.append({
                "src_tokens": np.concatenate([[0], rng.randint(4, 20, k), [2]]),
                "src_distance": rng.rand(k + 2, k + 2).astype(np.float32),
                "src_edge_type": rng.randint(0, 100, (k + 2, k + 2)),
                "smile": "C" * rng.randint(2, 30),
                "weights": np.float32(1.0),
            })
        coll = BatchCollator(SmilesTokenizer(), pad_idx=1, pad_mode="bucket",
                             atom_buckets=(16, 32, 64), smiles_buckets=(16, 32, 64))
        ds = MolDataset(feats, np.zeros((12, 1)))
        atom_shapes = set()
        for batch, _ in MolDataLoader(ds, 3, coll):
            n = batch["src_tokens"].shape[1]
            atom_shapes.add(n)
            assert n in (16, 32, 64)
            assert batch["input_ids"].shape[1] in (16, 32, 64)
        assert len(atom_shapes) <= 3


class TestReviewFixes:
    """Regression tests for the data-layer findings of the round-3 review."""

    def test_log1p_inverse_roundtrips(self, tmp_path):
        """log1p must inverse-transform with expm1 (the reference's
        FunctionTransformer(np.log1p) has an identity inverse — predictions
        stayed in log space)."""
        from mmdti_tpu.data.scaler import TargetScaler

        sc = TargetScaler("log1p", "regression")
        y = np.array([[0.5], [2.0], [10.0]])
        sc.fit(y, str(tmp_path))
        z = sc.transform(y)
        np.testing.assert_allclose(z, np.log1p(y), rtol=1e-6)
        np.testing.assert_allclose(sc.inverse_transform(z), y, rtol=1e-6)

    def test_missing_target_column_fills_only_missing(self, tmp_path):
        """One absent target column must not overwrite the present ones with
        the -1.0 sentinel (deliberate fix over the reference)."""
        import pandas as pd

        from mmdti_tpu.data.reader import MolDataReader

        df = pd.DataFrame({"smiles": ["CCO", "CCN"], "A": [0.7, 0.3]})
        p = str(tmp_path / "t.csv")
        df.to_csv(p, index=False)
        out = MolDataReader().read_data(
            p, is_train=False, task="multilabel_regression",
            target_cols=["A", "B"], smiles_col="smiles",
        )
        raw = np.asarray(out["raw_target"], dtype=float)
        np.testing.assert_allclose(raw[:, 0], [0.7, 0.3])
        np.testing.assert_allclose(raw[:, 1], [-1.0, -1.0])

    def test_anomaly_clean_constant_target_keeps_rows(self, tmp_path):
        """std=0 (constant target) must skip the 3-sigma filter instead of
        dropping every row."""
        import pandas as pd

        from mmdti_tpu.data.reader import MolDataReader

        df = pd.DataFrame({"smiles": ["CCO", "CCN", "CCS"], "y": [1.0, 1.0, 1.0]})
        p = str(tmp_path / "t.csv")
        df.to_csv(p, index=False)
        out = MolDataReader().read_data(
            p, is_train=True, task="regression", target_cols=["y"],
            smiles_col="smiles", anomaly_clean=True,
        )
        assert len(out["raw_target"]) == 3

    def test_train_refits_over_stale_scaler_artifact(self, tmp_path):
        """Training into a dir holding a previous run's target_scaler.ss must
        refit on the new data, not silently reuse the stale stats."""
        import pandas as pd

        from mmdti_tpu.data.hub import DataHub
        from mmdti_tpu.data.scaler import TargetScaler

        d = str(tmp_path)
        stale = TargetScaler("standard", "regression")
        stale.fit(np.linspace(100.0, 200.0, 50).reshape(-1, 1), d)  # old stats

        df = pd.DataFrame({
            "smiles": ["CCO", "CCN", "CCS", "CCC"], "y": [0.0, 1.0, 2.0, 3.0],
        })
        p = str(tmp_path / "new.csv")
        df.to_csv(p, index=False)
        hub = DataHub(data=p, is_train=True, save_path=d, task="regression",
                      target_cols=["y"], smiles_col="smiles",
                      target_normalize="standard")
        t = np.asarray(hub.data["target"]).reshape(-1)
        # refit on the new data: standardized targets are centered
        assert abs(t.mean()) < 1e-6
        assert abs(t.std() - 1.0) < 0.2

    def test_raw_atoms_coords_input(self):
        """atoms/coordinates input without a SMILES column must featurize via
        transform_raw instead of crashing on data['smiles'][idx]."""
        from mmdti_tpu.data.hub import DataHub

        data = {
            "atoms": [["C", "C", "O"], ["C", "N"]],
            "coordinates": [np.random.RandomState(0).randn(3, 3),
                            np.random.RandomState(1).randn(2, 3)],
            "target": [0.5, 1.5],
        }
        hub = DataHub(data=data, is_train=True, task="regression",
                      target_normalize="none", use_scaler=False)
        feats = hub.data["unimol_input"]
        assert len(feats) == 2
        assert "smile" not in feats[0]
        assert feats[0]["src_tokens"].shape[0] == 5  # BOS + 3 atoms + EOS
