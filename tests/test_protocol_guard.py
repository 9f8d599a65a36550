"""Accuracy regression guard on the finetune protocol (VERDICT r2 #3).

Runs one seed of the reference 5-seed scaffold protocol
(/root/reference/finetune.py:26-79) on the synthetic dataset with the small
architecture and pins the test RMSE under a threshold, so kernel / trainer /
loss changes cannot silently regress accuracy.

Slow (~4-10 min on the 1-core CPU host, dominated by XLA compiles — warm
compile cache helps): gated behind MMDTI_RUN_SLOW=1 and marked `slow`.
The flagship-scale equivalent (RMSE 0.27-0.34) runs on the chip via
`python finetune.py --synthetic`; see docs/PERF.md for the recorded numbers.
"""

import os

import pytest

SLOW = os.environ.get("MMDTI_RUN_SLOW", "") == "1"

# Measured on this config (seed 0, epochs 8, fp32/XLA path): RMSE 0.7207.
# A no-learning model scores ~= the target std (~1.2-1.4 on this dataset);
# the threshold sits between with margin for cross-platform float drift.
# (r4: tightened 0.90 -> 0.80 per VERDICT r3 weak #6 — 0.72 measured + ~10%
# drift margin; the old ceiling allowed a silent 25% regression.)
RMSE_CEILING = 0.80

# Both guards are calibrated against THIS architecture — retune the
# thresholds if it changes.
GUARD_ARCH = dict(
    unimol_overrides={"encoder_layers": 2, "embed_dim": 64,
                      "ffn_embed_dim": 128, "attention_heads": 8},
    chemberta_overrides={"hidden_size": 64, "num_hidden_layers": 2,
                         "num_attention_heads": 4,
                         "intermediate_size": 128},
)


# Default-suite accuracy smoke (VERDICT r3 weak #6: "the default suite never
# checks accuracy at all").  One seed, tiny architecture, few epochs — cheap
# enough to always run, strong enough to catch a broken learning signal
# (loss wiring, scaler, featurization, optimizer): the ceiling sits well
# below the no-learning score.
SMOKE_RMSE_CEILING = 1.0  # measured 0.836 on this config; no-learning ~1.25


class TestAccuracySmoke:
    def test_tiny_protocol_learns(self, tmp_path):
        import finetune as ft

        data = str(tmp_path / "smoke.csv")
        ft.make_synthetic_dataset(data, n=160)
        rmse = ft.run_seed(
            data, 0, str(tmp_path), epochs=4, early_stopping=4, batch_size=16,
            arch=dict(
                unimol_overrides={"encoder_layers": 2, "embed_dim": 32,
                                  "ffn_embed_dim": 64, "attention_heads": 4},
                chemberta_overrides={"hidden_size": 32, "num_hidden_layers": 1,
                                     "num_attention_heads": 2,
                                     "intermediate_size": 64},
            ),
            path_overrides={"compute_dtype": "float32", "use_pallas": False},
        )
        assert rmse < SMOKE_RMSE_CEILING, (
            f"accuracy smoke RMSE {rmse:.4f} regressed past {SMOKE_RMSE_CEILING} "
            "(no-learning scores ~1.25 on this dataset)"
        )


@pytest.mark.slow
@pytest.mark.skipif(not SLOW, reason="set MMDTI_RUN_SLOW=1 to run the protocol guard")
class TestProtocolGuard:
    def test_seed0_rmse_under_ceiling(self, tmp_path):
        import finetune as ft

        data = str(tmp_path / "synthetic.csv")
        ft.make_synthetic_dataset(data)
        rmse = ft.run_seed(
            data, 0, str(tmp_path), epochs=8, early_stopping=8, arch=GUARD_ARCH,
            path_overrides={"compute_dtype": "float32", "use_pallas": False},
        )
        assert rmse < RMSE_CEILING, (
            f"protocol seed-0 RMSE {rmse:.4f} regressed past {RMSE_CEILING}"
        )

    def test_seed0_classification_auc_above_floor(self, tmp_path):
        """BBBP-shaped guard: the classification stack (BCE head, sigmoid,
        CT_Single, AUC early-stop) must beat chance by a wide margin on the
        scaffold-held-out synthetic test set.  Flagship-scale chip runs score
        mean AUC 0.9368 (docs/PERF.md); this small-arch 8-epoch CPU config
        measured 0.968 — the 0.70 floor leaves margin for platform drift."""
        import finetune as ft

        data = str(tmp_path / "synthetic_clf.csv")
        ft.make_synthetic_dataset(data, task="classification")
        auc = ft.run_seed(
            data, 0, str(tmp_path), task="classification", epochs=8,
            early_stopping=8, arch=GUARD_ARCH,
            path_overrides={"compute_dtype": "float32", "use_pallas": False},
        )
        assert auc > 0.70, (
            f"protocol seed-0 classification AUC {auc:.4f} fell below 0.70"
        )

    def test_seed0_multiclass_auc_above_floor(self, tmp_path):
        """3-way softmax-CE stack (tercile labels, macro OvR AUC scoring;
        VERDICT r4 #2: multiclass had only unit-level evidence).  This
        small-arch config at lr 5e-4 / 16 epochs measured 0.8546 (at the
        regression guard's lr 1e-4 / 8 epochs it underfits toward the
        floor); chance is 0.5.  The flagship chip
        protocol scores mean 0.8952 (docs/PERF.md)."""
        import finetune as ft

        data = str(tmp_path / "synthetic_mc.csv")
        ft.make_synthetic_dataset(data, task="multiclass")
        auc = ft.run_seed(
            data, 0, str(tmp_path), task="multiclass", epochs=16,
            early_stopping=16, learning_rate=5e-4, arch=GUARD_ARCH,
            path_overrides={"compute_dtype": "float32", "use_pallas": False},
        )
        assert auc > 0.65, (
            f"protocol seed-0 multiclass macro-AUC {auc:.4f} fell below 0.65"
        )

    def test_seed0_multilabel_auc_above_floor(self, tmp_path):
        """3-column multilabel with ~10% NaN labels (NaN-masked focal loss +
        column-averaged AUC; VERDICT r4 #2).  This small-arch config at
        lr 5e-4 / 16 epochs measured 0.9133 (the focal loss downweights
        easy examples early: at lr 1e-4 / 8 epochs it sits near chance);
        chance is 0.5.  The flagship chip protocol scores mean 0.9654."""
        import finetune as ft

        data = str(tmp_path / "synthetic_ml.csv")
        ft.make_synthetic_dataset(data, task="multilabel_classification")
        auc = ft.run_seed(
            data, 0, str(tmp_path), task="multilabel_classification",
            epochs=16, early_stopping=16, learning_rate=5e-4, arch=GUARD_ARCH,
            path_overrides={"compute_dtype": "float32", "use_pallas": False},
        )
        assert auc > 0.65, (
            f"protocol seed-0 multilabel mean-AUC {auc:.4f} fell below 0.65"
        )
