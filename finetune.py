"""Experiment driver: 5-seed scaffold-split finetuning protocol.

Mirrors the reference protocol (/root/reference/finetune.py:26-79): for each
seed, random_scaffold_split 80/10/10 -> MolTrain -> MolPredict -> per-seed
RMSE -> result.csv.  Adds a real CLI (the reference is edit-the-constants) and
a --synthetic mode so the driver runs without external datasets.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmdti_tpu import MolPredict, MolTrain  # noqa: E402
from mmdti_tpu.splits import random_scaffold_split  # noqa: E402


MULTILABEL_COLS = ["t0", "t1", "t2"]


def make_synthetic_dataset(
    path: str, n: int = 400, seed: int = 0, task: str = "regression"
) -> None:
    """Solubility-like dataset: diverse scaffolds, target correlated with
    size/polarity so the model has signal to learn.  task='classification'
    binarizes the latent property at its median (a BBBP-shaped balanced
    binary label); 'multiclass' bins it into terciles (3-way softmax CE);
    'multilabel_classification' emits three binary columns from distinct
    structural properties with ~10% NaNs in one column, exercising the
    NaN-masked loss/metric path (reference models/loss.py:180-231)."""
    from mmdti_tpu.chem import parse_smiles

    scaffolds = [
        "c1ccccc1", "C1CCCCC1", "c1ccncc1", "c1ccc2ccccc2c1", "C1CCNCC1",
        "c1ccoc1", "c1ccsc1", "C1CCOC1", "c1cncnc1", "C1CC1", "C1CCC1",
        "C1CCCC1", "c1cnccn1", "C1CCNC1", "c1cc[nH]c1", "C1COCCN1",
        "C1CCOCC1", "c1cscn1", "C1CNCCN1", "c1ccc2[nH]ccc2c1",
    ]
    subs = ["", "C", "CC", "CCC", "O", "N", "Cl", "F", "OC", "C(=O)O", "C(C)C", "CO"]
    rng = np.random.RandomState(seed)
    # the multilabel columns draw their label noise from a SEPARATE stream:
    # consuming extra draws from `rng` would shift every later row's
    # scaffold/substituent/target draws and silently change the historical
    # regression/classification datasets (RMSEs stop being comparable
    # round-over-round — caught when the round-5 HEAD re-run moved seed-0
    # RMSE 0.27 -> 0.45 on what should have been identical data)
    rng2 = np.random.RandomState(seed + 104729)
    rows = []
    for i in range(n):
        smi = f"{subs[rng.randint(len(subs))]}{scaffolds[rng.randint(len(scaffolds))]}"
        mol = parse_smiles(smi)
        n_heavy = mol.num_atoms()
        n_hetero = sum(1 for a in mol.atoms if a.symbol not in ("C", "H"))
        n_arom = sum(1 for a in mol.atoms if a.aromatic)
        y = -0.2 * n_heavy + 0.8 * n_hetero + rng.randn() * 0.3
        rows.append((smi, y, n_heavy, n_hetero + rng2.randn() * 0.3,
                     n_arom + rng2.randn() * 0.3))
    df = pd.DataFrame(rows, columns=["smiles", "measured", "_sz", "_het", "_ar"])
    if task == "classification":
        df["measured"] = (df["measured"] > df["measured"].median()).astype(int)
    elif task == "multiclass":
        df["measured"] = pd.qcut(df["measured"], 3, labels=False).astype(int)
    elif task == "multilabel_classification":
        df["t0"] = (df["_sz"] > df["_sz"].median()).astype(float)
        df["t1"] = (df["_het"] > df["_het"].median()).astype(float)
        df["t2"] = (df["_ar"] > df["_ar"].median()).astype(float)
        # ~10% missing labels in one column: the NaN-masked loss/metrics path
        df.loc[df.sample(frac=0.1, random_state=seed).index, "t2"] = np.nan
        df = df.drop(columns=["measured"])
    df = df.drop(columns=["_sz", "_het", "_ar"])
    df.to_csv(path, index=False)


def _score_task(task, truth, test_pred, idx):
    """Protocol test metric: RMSE (regression), ROC-AUC (classification),
    macro one-vs-rest AUC (multiclass probs), NaN-masked column-mean AUC
    (multilabel)."""
    from sklearn.metrics import roc_auc_score

    if task == "regression":
        return float(np.sqrt(np.mean((truth - test_pred.reshape(-1)) ** 2)))
    if task == "multiclass":
        if len(np.unique(truth)) < test_pred.shape[1]:
            print(f"seed {idx}: test split misses a class, macro AUC NaN")
            return float("nan")
        return float(roc_auc_score(
            truth.reshape(-1), test_pred, multi_class="ovr", average="macro"
        ))
    if task == "multilabel_classification":
        aucs = []
        for j in range(truth.shape[1]):
            m = ~np.isnan(truth[:, j])
            if len(np.unique(truth[m, j])) < 2:
                continue  # column single-class in this split: skip
            aucs.append(roc_auc_score(truth[m, j], test_pred[m, j]))
        if not aucs:
            print(f"seed {idx}: all label columns single-class, AUC NaN")
            return float("nan")
        return float(np.mean(aucs))
    if len(np.unique(truth)) < 2:
        # a scaffold test split can come out single-class on real data; AUC
        # is undefined there — score NaN instead of killing the other seeds
        print(f"seed {idx}: test split is single-class, AUC undefined (NaN)")
        return float("nan")
    return float(roc_auc_score(truth.reshape(-1), test_pred.reshape(-1)))


def run_seed(
    data_path, idx, workdir, *, task="regression", epochs=40, learning_rate=1e-4,
    batch_size=32, early_stopping=20, fds_num=30, target_col="measured",
    smiles_col="smiles", chemberta_dir="", unimol_dir="", arch=None,
    path_overrides=None,
) -> float:
    """One protocol seed: scaffold split -> MolTrain -> MolPredict -> metric
    (reference /root/reference/finetune.py:26-79 body).  Regression scores
    test RMSE (ESOL protocol); classification tasks score ROC-AUC variants
    (FDS/LDS weighting are regression-only and stay off)."""
    train_df, valid_df, test_df = random_scaffold_split(
        data_path, random_seed=idx, ratio_test=0.1, ration_valid=0.1
    )
    paths = {}
    for name, df in (("train", train_df), ("val", valid_df), ("test", test_df)):
        p = os.path.join(workdir, f"{name}_{idx}.csv")
        df.to_csv(p, index=False)
        paths[name] = p

    regression = task == "regression"
    target_cols = (
        MULTILABEL_COLS if task == "multilabel_classification" else [target_col]
    )
    if regression:
        task_kwargs = dict(
            use_weight=True, all_weight=False, fds=True, fds_num=fds_num,
            fds_raw_path=paths["train"], fds_col_data=target_col,
            target_anomaly_check="filter", metrics="mse",
        )
    elif task == "multiclass":
        task_kwargs = dict(metrics="log_loss")
    else:
        task_kwargs = dict(metrics="auc")
    save_path = os.path.join(workdir, f"exp_seed_{idx}")
    clf = MolTrain(
        task=task,
        epochs=epochs,
        learning_rate=learning_rate,
        batch_size=batch_size,
        early_stopping=early_stopping,
        smiles_col=smiles_col,
        save_path=save_path,
        target_cols=target_cols,
        model_name="mm_model",
        using_infonce=True,
        using_ct=True,
        raw_data=paths["train"],
        seed=42,
        chemberta_dir=chemberta_dir,
        unimol_dir=unimol_dir,
        **task_kwargs,
        **(path_overrides or {}),
        **(arch or {}),
    )
    clf.fit(paths["train"], paths["val"])

    predictor = MolPredict(load_model=save_path)
    test_pred = predictor.predict(paths["test"])
    truth = pd.read_csv(paths["test"])[target_cols].values
    if task in ("regression", "classification"):
        truth = truth.reshape(-1)
    return _score_task(task, truth, np.asarray(test_pred), idx)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=None, help="CSV with smiles + target column")
    ap.add_argument("--task", default="regression",
                    choices=["regression", "classification", "multiclass",
                             "multilabel_classification"],
                    help="protocol metric: regression=RMSE (ESOL shape), "
                         "classification=ROC-AUC (BBBP shape), "
                         "multiclass=macro OvR AUC (3-way terciles), "
                         "multilabel_classification=NaN-masked column-mean "
                         "AUC (3 binary columns)")
    ap.add_argument("--target-col", default="measured")
    ap.add_argument("--smiles-col", default="smiles")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--early-stopping", type=int, default=20)
    ap.add_argument("--fds-num", type=int, default=30)
    ap.add_argument("--chemberta-dir", default="")
    ap.add_argument("--unimol-dir", default="")
    ap.add_argument("--out", default="result.csv")
    ap.add_argument("--workdir", default="./finetune_runs")
    ap.add_argument("--synthetic", action="store_true", help="generate a synthetic dataset")
    ap.add_argument("--small", action="store_true", help="small architecture (debug)")
    ap.add_argument(
        "--use-pallas", default="auto", choices=["auto", "true", "false"],
        help="attention path: auto (Pallas on TPU), or force on/off "
             "(false = the XLA oracle path with fp32 pair logits)",
    )
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--seed-offset", type=int, default=0,
                    help="first split seed (protocol seeds are offset..offset+seeds-1)")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data_path = args.data
    if data_path is None or args.synthetic:
        data_path = os.path.join(args.workdir, "synthetic.csv")
        make_synthetic_dataset(data_path, task=args.task)
        print(f"Generated synthetic dataset at {data_path}")

    arch = {}
    if args.small:
        arch = dict(
            unimol_overrides={"encoder_layers": 2, "embed_dim": 64,
                              "ffn_embed_dim": 128, "attention_heads": 8},
            chemberta_overrides={"hidden_size": 64, "num_hidden_layers": 2,
                                 "num_attention_heads": 4, "intermediate_size": 128},
        )

    path_overrides = {"compute_dtype": args.compute_dtype}
    if args.use_pallas != "auto":
        path_overrides["use_pallas"] = args.use_pallas == "true"

    metric_name = "rmse" if args.task == "regression" else "auc"
    scores = []
    for idx in range(args.seed_offset, args.seed_offset + args.seeds):
        score = run_seed(
            data_path, idx, args.workdir, task=args.task,
            epochs=args.epochs, learning_rate=args.learning_rate,
            batch_size=args.batch_size, early_stopping=args.early_stopping,
            fds_num=args.fds_num, target_col=args.target_col,
            smiles_col=args.smiles_col, chemberta_dir=args.chemberta_dir,
            unimol_dir=args.unimol_dir, arch=arch,
            path_overrides=path_overrides,
        )
        scores.append(score)
        print(f"seed {idx}: test {metric_name.upper()} = {score:.4f}")
        # write incrementally so completed seeds survive a crash mid-protocol
        seeds_done = list(range(args.seed_offset, args.seed_offset + len(scores)))
        pd.DataFrame({"seed": seeds_done, metric_name: scores}).to_csv(
            args.out, index=False
        )

    print(
        f"mean {metric_name.upper()} over {args.seeds} seeds: "
        f"{np.nanmean(scores):.4f} -> {args.out}"
    )


if __name__ == "__main__":
    main()
