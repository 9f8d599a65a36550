"""K-fold cross-validation through the public API.

The reference exposes kfold/split/split_group_col kwargs
(/root/reference/train.py:88-90) but its NNModel.run trains fold 0 only
(/root/reference/models/nnmodel.py:156-199).  Here fit(train) — the calling
pattern the reference cannot handle at all (its fit requires data_val
positionally) — runs real CV: K models, out-of-fold cv_pred, and MolPredict
fold-ensembling driven by the saved config's model_folds.
"""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from tests.conftest import SMALL_ARCH, SMILES_20

FAST = dict(
    task="regression",
    metrics="mse",
    epochs=1,
    batch_size=4,
    use_scaler=False,          # keep ensemble-mean algebra exact (no inverse)
    target_normalize="none",
    compute_dtype="float32",
    use_pallas=False,
    **SMALL_ARCH,
)


@pytest.fixture(scope="module")
def cv_exp(tmp_path_factory):
    """One kfold=2 CV experiment shared by the assertions below."""
    from mmdti_tpu import MolTrain

    tmp = tmp_path_factory.mktemp("cv")
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"smiles": SMILES_20, "measured": rng.randn(len(SMILES_20))})
    train_csv = str(tmp / "train.csv")
    df.to_csv(train_csv, index=False)
    exp = str(tmp / "exp")
    clf = MolTrain(
        kfold=2, split="random", save_path=exp,
        smiles_col="smiles", target_cols=["measured"], **FAST,
    )
    clf.fit(train_csv)  # no validation set -> CV
    return clf, exp, df


class TestKFoldTrain:
    def test_every_fold_checkpoint_written(self, cv_exp):
        _, exp, _ = cv_exp
        assert os.path.exists(os.path.join(exp, "model_0.ckpt"))
        assert os.path.exists(os.path.join(exp, "model_1.ckpt"))

    def test_out_of_fold_predictions_cover_dataset(self, cv_exp):
        clf, _, df = cv_exp
        assert clf.cv_pred.shape == (len(df), 1)
        assert np.isfinite(clf.cv_pred).all()

    def test_config_records_fold_contract(self, cv_exp):
        _, exp, _ = cv_exp
        with open(os.path.join(exp, "config.yaml")) as f:
            cfg = yaml.safe_load(f)
        assert cfg["model_folds"] == 2
        assert cfg["split_method"] == "2fold_random"

    def test_predict_averages_fold_checkpoints(self, cv_exp, tmp_path):
        """The ensemble prediction must equal the mean of the individual fold
        models' predictions (no scaler, so the algebra is exact)."""
        import shutil

        from mmdti_tpu import MolPredict

        _, exp, df = cv_exp
        test_csv = str(tmp_path / "test.csv")
        df.iloc[:6].to_csv(test_csv, index=False)

        ens = MolPredict(load_model=exp).predict(test_csv)
        assert ens.shape == (6, 1) and np.isfinite(ens).all()

        # per-fold predictions via single-fold experiment-dir clones
        per_fold = []
        for fold in (0, 1):
            solo = str(tmp_path / f"solo{fold}")
            shutil.copytree(exp, solo)
            with open(os.path.join(solo, "config.yaml")) as f:
                cfg = yaml.safe_load(f)
            cfg["model_folds"] = 1
            with open(os.path.join(solo, "config.yaml"), "w") as f:
                yaml.safe_dump(cfg, f)
            if fold:
                os.replace(
                    os.path.join(solo, "model_1.ckpt"),
                    os.path.join(solo, "model_0.ckpt"),
                )
            per_fold.append(MolPredict(load_model=solo).predict(test_csv))
        assert not np.allclose(per_fold[0], per_fold[1])  # folds truly differ
        np.testing.assert_allclose(
            ens, (per_fold[0] + per_fold[1]) / 2, rtol=1e-5, atol=1e-6
        )


class TestKFoldCompileReuse:
    def test_second_fold_reuses_step_functions(self, tmp_path, monkeypatch):
        """fit_predict memoizes its jit'd step builders on the Trainer: fold
        2+ must reuse fold 1's function objects (same program -> JAX's
        in-process executable cache) instead of paying another full remote
        compile per fold on the TPU backend."""
        from mmdti_tpu import MolTrain
        from mmdti_tpu.train.trainer import Trainer

        calls = {"train": 0, "sweep": 0}
        orig_train, orig_sweep = Trainer.build_train_step, Trainer.build_eval_sweep

        def count_train(self, *a, **k):
            calls["train"] += 1
            return orig_train(self, *a, **k)

        def count_sweep(self, *a, **k):
            calls["sweep"] += 1
            return orig_sweep(self, *a, **k)

        monkeypatch.setattr(Trainer, "build_train_step", count_train)
        monkeypatch.setattr(Trainer, "build_eval_sweep", count_sweep)

        rng = np.random.RandomState(11)
        df = pd.DataFrame({"smiles": SMILES_20, "measured": rng.randn(len(SMILES_20))})
        csv = str(tmp_path / "t.csv")
        df.to_csv(csv, index=False)
        MolTrain(kfold=2, save_path=str(tmp_path / "exp"), smiles_col="smiles",
                 target_cols=["measured"], **FAST).fit(csv)
        # equal 10-row folds -> identical schedule horizon -> one build each
        assert calls["train"] == 1
        # one plain validation sweep, shared by both folds (+1 if FDS were on)
        assert calls["sweep"] == 1


class TestKFoldSurface:
    def test_missing_val_requires_kfold(self, tmp_path):
        from mmdti_tpu import MolTrain

        clf = MolTrain(kfold=1, save_path=str(tmp_path / "exp"),
                       smiles_col="smiles", target_cols=["measured"], **FAST)
        with pytest.raises(ValueError, match="kfold"):
            clf.fit(str(tmp_path / "missing.csv"))

    def test_explicit_val_keeps_reference_behavior(self, tmp_path):
        """fit(train, val) with a kfold kwarg must stay a drop-in twin of the
        reference: ONE model trained, kfold config-only."""
        from mmdti_tpu import MolTrain

        rng = np.random.RandomState(5)
        df = pd.DataFrame({"smiles": SMILES_20, "measured": rng.randn(len(SMILES_20))})
        train_csv, val_csv = str(tmp_path / "t.csv"), str(tmp_path / "v.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        exp = str(tmp_path / "exp")
        MolTrain(kfold=3, save_path=exp, smiles_col="smiles",
                 target_cols=["measured"], **FAST).fit(train_csv, val_csv)
        assert os.path.exists(os.path.join(exp, "model_0.ckpt"))
        assert not os.path.exists(os.path.join(exp, "model_1.ckpt"))
        with open(os.path.join(exp, "config.yaml")) as f:
            assert yaml.safe_load(f)["model_folds"] == 1

    def test_scaffold_folds_keep_groups_intact(self, tmp_path):
        """split='scaffold': no Bemis-Murcko scaffold may span folds."""
        from mmdti_tpu import MolTrain
        from mmdti_tpu.data.hub import DataHub

        rng = np.random.RandomState(7)
        df = pd.DataFrame({"smiles": SMILES_20, "measured": rng.randn(len(SMILES_20))})
        csv = str(tmp_path / "t.csv")
        df.to_csv(csv, index=False)
        clf = MolTrain(kfold=2, split="scaffold", save_path=str(tmp_path / "exp"),
                       smiles_col="smiles", target_cols=["measured"], **FAST)
        clf.data_train = DataHub(
            data=csv, is_train=True, save_path=None, **clf.config
        ).data
        groups = np.asarray(clf.data_train["group"])
        for tr_idx, va_idx in clf._cv_splits(2):
            assert not set(groups[tr_idx]) & set(groups[va_idx])


class TestServeEnsemble:
    def test_serve_all_folds_matches_molpredict(self, cv_exp, tmp_path):
        """serve_folds='all' must reproduce MolPredict's fold-mean exactly:
        the vmapped on-device ensemble averages activated outputs the same
        way evaluate() does (no scaler in FAST, so the algebra is exact)."""
        from mmdti_tpu import MolPredict, MolServe

        _, exp, df = cv_exp
        test_csv = str(tmp_path / "test.csv")
        df.iloc[:6].to_csv(test_csv, index=False)
        ens = MolPredict(load_model=exp).predict(test_csv)

        srv = MolServe(exp, serve_folds="all")
        assert srv.serve_folds == 2
        out = srv.predict(list(df.iloc[:6]["smiles"]))["predict"]
        np.testing.assert_allclose(out, ens, rtol=1e-4, atol=1e-4)

        # and the default stays the single-fold latency contract
        solo = MolServe(exp)
        assert solo.serve_folds == 1
        y0 = solo.predict(list(df.iloc[:6]["smiles"]))["predict"]
        assert not np.allclose(y0, out)  # the ensemble really averaged

    def test_serve_folds_validated(self, cv_exp):
        from mmdti_tpu import MolServe

        _, exp, _ = cv_exp
        with pytest.raises(ValueError, match="serve_folds"):
            MolServe(exp, serve_folds=5)
        with pytest.raises(ValueError, match="serve_folds"):
            MolServe(exp, serve_folds=0)

    def test_fold_ensemble_on_dp_mesh(self, cv_exp):
        """The vmapped fold ensemble serves on a pure-DP mesh (params
        replicated with their leading fold axis intact)."""
        from mmdti_tpu import MolServe

        _, exp, df = cv_exp
        smiles = list(df.iloc[:6]["smiles"])
        base = MolServe(exp, serve_folds="all").predict(smiles)["predict"]
        meshed = MolServe(exp, serve_folds="all", mesh_shape=(8, 1))
        out = meshed.predict(smiles)["predict"]
        np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-6)

    def test_fold_ensemble_rejects_tp_mesh(self, cv_exp):
        """Rank-2 TP_RULES specs would shard the wrong dim of the rank-3
        fold-stacked kernels — the combination must refuse loudly."""
        from mmdti_tpu import MolServe

        _, exp, _ = cv_exp
        with pytest.raises(ValueError, match="tensor-parallel"):
            MolServe(exp, serve_folds="all", mesh_shape=(4, 2))
