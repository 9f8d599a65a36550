"""Integration: MolTrain -> artifacts -> MolPredict, CSV/config contracts
(SURVEY §4 'Integration (CPU-runnable)')."""

import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SMALL_ARCH


@pytest.fixture(scope="module")
def trained_exp(tiny_csv_module, tmp_path_factory):
    train_p, val_p, _ = tiny_csv_module
    exp = str(tmp_path_factory.mktemp("exp"))
    from mmdti_tpu import MolTrain

    clf = MolTrain(
        task="regression", epochs=2, learning_rate=1e-3, batch_size=8,
        early_stopping=5, metrics="mse", smiles_col="smiles", save_path=exp,
        target_cols=["measured"], using_infonce=True, using_ct=True,
        raw_data=train_p, use_weight=True, fds=True, fds_num=8,
        fds_raw_path=train_p, fds_col_data="measured", seed=42,
        compute_dtype="float32", use_pallas=False, **SMALL_ARCH,
    )
    clf.fit(train_p, val_p)
    return exp, train_p, val_p


@pytest.fixture(scope="module")
def tiny_csv_module(tmp_path_factory):
    from tests.conftest import SMILES_20

    rng = np.random.RandomState(0)
    tmp = tmp_path_factory.mktemp("data_e2e")
    df = pd.DataFrame({"smiles": SMILES_20, "measured": rng.randn(len(SMILES_20)) * 2 + 1})
    train, val = tmp / "train.csv", tmp / "val.csv"
    df.iloc[:16].to_csv(train, index=False)
    df.iloc[16:].to_csv(val, index=False)
    return str(train), str(val), str(tmp)


class TestTrainArtifacts:
    def test_experiment_dir_contract(self, trained_exp):
        exp, _, _ = trained_exp
        files = set(os.listdir(exp))
        assert "config.yaml" in files
        assert "model_0.ckpt" in files
        assert "target_scaler.ss" in files

    def test_history_artifact(self, trained_exp):
        """Per-epoch scalars land in a parseable history_{fold}.json."""
        import json

        exp, _, _ = trained_exp
        with open(os.path.join(exp, "history_0.json")) as f:
            hist = json.load(f)
        assert len(hist) >= 1
        for row in hist:
            assert {"epoch", "train_loss", "val_loss", "seconds"} <= set(row)
            assert np.isfinite(row["val_loss"])

    def test_config_roundtrip(self, trained_exp):
        exp, _, _ = trained_exp
        from mmdti_tpu.configs import load_yaml

        cfg = load_yaml(os.path.join(exp, "config.yaml"))
        assert cfg.task == "regression"
        assert cfg.target_cols == "measured"
        assert cfg.num_classes == 1


class TestOrbaxCheckpointBackend:
    def test_orbax_roundtrip_unit(self, tmp_path):
        """save_checkpoint(backend='orbax') round-trips through the
        autodetecting load_checkpoint."""
        import jax.numpy as jnp

        from mmdti_tpu.train import load_checkpoint, save_checkpoint

        params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                            "bias": jnp.zeros((3,))}}
        save_checkpoint(str(tmp_path), 0, params, None, backend="orbax")
        assert os.path.isdir(os.path.join(str(tmp_path), "model_0.orbax"))
        restored = load_checkpoint(str(tmp_path), 0)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["dense"]["kernel"]),
            np.arange(6.0).reshape(2, 3),
        )
        assert restored["fds"] == {}

    def test_backend_switch_removes_stale_artifact(self, tmp_path):
        """Re-saving with a different backend must delete the other format's
        artifact — otherwise the autodetecting load serves stale weights."""
        import jax.numpy as jnp
        import pytest as _pytest

        from mmdti_tpu.train import load_checkpoint, save_checkpoint

        p1 = {"w": jnp.ones((2, 2))}
        p2 = {"w": jnp.full((2, 2), 7.0)}
        d = str(tmp_path)
        save_checkpoint(d, 0, p1, None, backend="orbax")
        save_checkpoint(d, 0, p2, None, backend="msgpack")
        assert not os.path.isdir(os.path.join(d, "model_0.orbax"))
        restored = load_checkpoint(d, 0)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.full((2, 2), 7.0))
        with _pytest.raises(ValueError):
            save_checkpoint(d, 0, p1, None, backend="Orbax")

    def test_train_predict_with_orbax(self, tiny_csv_module, tmp_path):
        """Full MolTrain(checkpoint_backend='orbax') -> MolPredict contract."""
        train_p, val_p, _ = tiny_csv_module
        exp = str(tmp_path / "exp_orbax")
        from mmdti_tpu import MolPredict, MolTrain

        clf = MolTrain(
            task="regression", epochs=1, learning_rate=1e-3, batch_size=8,
            early_stopping=5, metrics="mse", smiles_col="smiles",
            save_path=exp, target_cols=["measured"], seed=42,
            compute_dtype="float32", use_pallas=False,
            checkpoint_backend="orbax", **SMALL_ARCH,
        )
        clf.fit(train_p, val_p)
        assert os.path.isdir(os.path.join(exp, "model_0.orbax"))
        assert not os.path.exists(os.path.join(exp, "model_0.ckpt"))
        out = str(tmp_path / "pred_orbax")
        pred = MolPredict(load_model=exp).predict(val_p, save_path=out)
        assert np.isfinite(np.asarray(pred)).all()


class TestPredict:
    def test_predict_with_truth(self, trained_exp, tmp_path):
        exp, _, val_p = trained_exp
        from mmdti_tpu import MolPredict

        out_dir = str(tmp_path / "out")
        pred = MolPredict(load_model=exp)
        y = pred.predict(val_p, save_path=out_dir)
        assert y.shape == (4, 1)
        assert np.isfinite(y).all()
        files = os.listdir(out_dir)
        csvs = [f for f in files if f.endswith(".csv")]
        assert len(csvs) == 1
        df = pd.read_csv(os.path.join(out_dir, csvs[0]))
        assert "predict_measured" in df.columns
        assert "test_metric.result" in files

    def test_predict_without_truth(self, trained_exp, tmp_path):
        exp, _, val_p = trained_exp
        from mmdti_tpu import MolPredict

        df = pd.read_csv(val_p)[["smiles"]]
        p = str(tmp_path / "notruth.csv")
        df.to_csv(p, index=False)
        out_dir = str(tmp_path / "out2")
        y = MolPredict(load_model=exp).predict(p, save_path=out_dir)
        assert y.shape[0] == len(df)
        files = os.listdir(out_dir)
        assert "test_metric.result" not in files
        out_df = pd.read_csv(os.path.join(out_dir, [f for f in files if f.endswith(".csv")][0]))
        assert "measured" not in out_df.columns

    def test_extract_feature_atomic_outputs(self, trained_exp):
        """Repr extraction returns per-atom reprs, coords, and decoded symbols
        (reference Trainer.inference, tasks/trainer.py:508-519)."""
        exp, _, val_p = trained_exp
        from mmdti_tpu import MolPredict

        pred = MolPredict(load_model=exp, extract_feature=True)
        pred.predict(val_p)
        reprs = pred.cv_repr
        n = len(pd.read_csv(val_p))
        assert len(reprs["cls_repr"]) == n
        assert len(reprs["atomic_reprs"]) == n
        assert len(reprs["atomic_coords"]) == n
        assert len(reprs["atomic_symbol"]) == n
        for rep, coords, syms in zip(
            reprs["atomic_reprs"], reprs["atomic_coords"], reprs["atomic_symbol"]
        ):
            assert rep.shape[0] == coords.shape[0] == len(syms)
            assert coords.shape[1] == 3
            assert all(isinstance(s, str) and s not in ("[CLS]", "[SEP]") for s in syms)
        # Clc1ccccc1 (val row 0 in the 20-SMILES fixture order: index 16)
        sym0 = reprs["atomic_symbol"][0]
        assert "Cl" in sym0 and "C" in sym0

    def test_determinism(self, trained_exp):
        exp, _, val_p = trained_exp
        from mmdti_tpu import MolPredict

        y1 = MolPredict(load_model=exp).predict(val_p)
        y2 = MolPredict(load_model=exp).predict(val_p)
        np.testing.assert_allclose(y1, y2, atol=1e-6)

    def test_device_feed_sweep_matches_loader(self, trained_exp, tmp_path):
        """Bulk inference through the device-resident sweep (feed auto-on)
        equals the per-batch host loader path."""
        exp, _, val_p = trained_exp
        from mmdti_tpu import MolPredict

        p_feed = MolPredict(load_model=exp)
        y_feed = p_feed.predict(val_p)
        p_loader = MolPredict(load_model=exp)
        p_loader.config.device_feed = False
        y_loader = p_loader.predict(val_p)
        np.testing.assert_allclose(y_feed, y_loader, atol=1e-6)


class TestProfiler:
    def test_profile_dir_produces_trace(self, tiny_csv_module, tmp_path):
        """profile_dir knob wraps the first train dispatches in an xprof trace
        and writes it out (VERDICT r1 #8; SURVEY §5 tracing row)."""
        train_p, val_p, _ = tiny_csv_module
        exp = str(tmp_path / "exp_prof")
        trace_dir = str(tmp_path / "trace")
        from mmdti_tpu import MolTrain

        MolTrain(
            task="regression", epochs=1, learning_rate=1e-3, batch_size=8,
            metrics="mse", smiles_col="smiles", save_path=exp,
            target_cols=["measured"], seed=42, compute_dtype="float32",
            use_pallas=False, profile_dir=trace_dir, profile_steps=2,
            **SMALL_ARCH,
        ).fit(train_p, val_p)
        assert os.path.isdir(trace_dir)
        found = []
        for root, _, files in os.walk(trace_dir):
            found.extend(files)
        assert found, "no trace files written"


class TestScanFusionEquivalence:
    def test_steps_per_call_preserves_predictions(self, tiny_csv_module, tmp_path):
        """K-fused scan steps must reproduce single-step training exactly
        (same math, same RNG stream)."""
        from mmdti_tpu import MolTrain

        train_p, val_p, _ = tiny_csv_module
        preds = {}
        for spc in (1, 3):
            exp = str(tmp_path / f"exp_spc{spc}")
            m = MolTrain(
                task="regression", epochs=2, batch_size=8, metrics="mse",
                smiles_col="smiles", save_path=exp, target_cols=["measured"],
                seed=0, compute_dtype="float32", use_pallas=False,
                steps_per_call=spc, **SMALL_ARCH,
            )
            m.fit(train_p, val_p)
            preds[spc] = np.asarray(m.cv_pred)
        np.testing.assert_allclose(preds[1], preds[3], atol=1e-6)


class TestDeviceFeedEquivalence:
    def test_device_feed_preserves_training(self, tiny_csv_module, tmp_path):
        """The device-resident feed (on-device row gathers from resident
        dataset arrays) must reproduce the host loader path exactly: same
        shuffle stream, same step math, same validation sweep.  FDS is on so
        the feed's fused FDS sweep is part of the equivalence."""
        import json

        from mmdti_tpu import MolTrain

        train_p, val_p, _ = tiny_csv_module
        preds, hist = {}, {}
        for feed in (False, True):
            exp = str(tmp_path / f"exp_feed{feed}")
            m = MolTrain(
                task="regression", epochs=2, batch_size=8, metrics="mse",
                smiles_col="smiles", save_path=exp, target_cols=["measured"],
                seed=0, compute_dtype="float32", use_pallas=False,
                using_infonce=True, using_ct=True, use_weight=True,
                fds=True, fds_num=8, raw_data=train_p, fds_raw_path=train_p,
                fds_col_data="measured", device_feed=feed, **SMALL_ARCH,
            )
            m.fit(train_p, val_p)
            preds[feed] = np.asarray(m.cv_pred)
            with open(os.path.join(exp, "history_0.json")) as f:
                hist[feed] = json.load(f)
        np.testing.assert_allclose(preds[False], preds[True], atol=1e-6)
        for row_a, row_b in zip(hist[False], hist[True]):
            for k in ("train_loss", "m_loss", "val_loss", "val_mse"):
                assert abs(row_a[k] - row_b[k]) < 1e-5, (k, row_a, row_b)

    def test_explicit_steps_per_call_matches_default(self, tiny_csv_module, tmp_path):
        """An explicit steps_per_call that does not divide the epoch's batch
        count is snapped to a divisor (one compiled scan shape — a trailing
        partial block would retrace the whole train program); the grouping
        must not change the math."""
        import json

        from mmdti_tpu import MolTrain

        train_p, val_p, _ = tiny_csv_module
        hist = {}
        for spc in (None, 3):  # 16 rows / batch 4 -> nb=4; 4 % 3 != 0
            exp = str(tmp_path / f"exp_spc{spc}")
            kwargs = dict(
                task="regression", epochs=2, batch_size=4, metrics="mse",
                smiles_col="smiles", save_path=exp, target_cols=["measured"],
                seed=0, compute_dtype="float32", use_pallas=False,
                device_feed=True, **SMALL_ARCH,
            )
            if spc is not None:
                kwargs["steps_per_call"] = spc
            MolTrain(**kwargs).fit(train_p, val_p)
            with open(os.path.join(exp, "history_0.json")) as f:
                hist[spc] = json.load(f)
        for row_a, row_b in zip(hist[None], hist[3]):
            for k in ("train_loss", "m_loss", "val_loss", "val_mse"):
                assert abs(row_a[k] - row_b[k]) < 1e-6, (k, row_a, row_b)

    def test_device_feed_true_requires_static_padding(self, tiny_csv_module, tmp_path):
        from mmdti_tpu import MolTrain

        train_p, val_p, _ = tiny_csv_module
        m = MolTrain(
            task="regression", epochs=1, batch_size=8, metrics="mse",
            smiles_col="smiles", save_path=str(tmp_path / "exp"),
            target_cols=["measured"], seed=0, compute_dtype="float32",
            use_pallas=False, device_feed=True, pad_mode="bucket",
            **SMALL_ARCH,
        )
        with pytest.raises(ValueError, match="static padding"):
            m.fit(train_p, val_p)
