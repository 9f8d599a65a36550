"""End-to-end MolTrain.fit throughput on the real chip (flagship).

bench.py measures the resident-input device step; this probe measures the
full user-facing fit loop — host featurization (cached after epoch 1),
collation, host->device transfer, jit'd train step, per-epoch validation —
so the "the pipeline keeps the chip fed" claim is a wall-clock number, not
an architecture diagram.  Optionally A/Bs device-side vs host pair
featurization (the input-transfer lever, ops/pair_feats.py).

Reads per-epoch wall seconds from the history_{fold}.json artifact and
reports steady-state epochs (>=2, featurization cache warm, jit compiled).

Usage: python scripts/fit_probe.py [--n 3200] [--epochs 4] [--both-modes]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MMDTI_DISABLE_FILE_LOG", "1")


def synth_csv(path: str, n: int, seed: int) -> None:
    import numpy as np
    import pandas as pd

    from mmdti_tpu.chem.smiles import is_valid_smiles

    rng = np.random.RandomState(seed)
    frags = ["C", "CC", "CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1",
             "COC", "CCS", "c1ccncc1", "CC(C)C", "OCCO", "CC#N", "CCCl",
             "C(=O)O", "CCCC"]
    rows = []
    while len(rows) < n:
        smi = "".join(rng.choice(frags) for _ in range(rng.randint(1, 4)))
        if not is_valid_smiles(smi):
            continue
        rows.append({"smiles": smi, "measured": float(len(smi) / 10.0 + rng.randn() * 0.1)})
    pd.DataFrame(rows).to_csv(path, index=False)


def run_fit(train_csv, val_csv, exp, epochs, batch_size, device_pair_feats):
    from mmdti_tpu import MolTrain

    clf = MolTrain(
        task="regression", epochs=epochs, batch_size=batch_size, metrics="mse",
        smiles_col="smiles", target_cols=["measured"], save_path=exp,
        using_infonce=True, using_ct=True, use_weight=True,
        seed=42, device_pair_feats=device_pair_feats,
        cache_dir_train=os.path.join(exp, "cache_tr.pkl"),
        cache_dir_test=os.path.join(exp, "cache_va.pkl"),
        # no early stop surprises on synthetic data
        early_stopping=epochs + 1,
    )
    clf.fit(train_csv, val_csv)
    with open(os.path.join(exp, "history_0.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3200)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--both-modes", action="store_true")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}")

    root = tempfile.mkdtemp(prefix="fit_probe_")
    train_csv = os.path.join(root, "train.csv")
    val_csv = os.path.join(root, "val.csv")
    synth_csv(train_csv, args.n, seed=0)
    synth_csv(val_csv, max(args.n // 10, args.batch_size), seed=1)

    modes = [True, False] if args.both_modes else [True]
    for mode in modes:
        exp = os.path.join(root, f"exp_{'dev' if mode else 'host'}")
        hist = run_fit(train_csv, val_csv, exp, args.epochs, args.batch_size, mode)
        steady = [h for h in hist if h["epoch"] >= 2]
        secs = [h["seconds"] for h in steady]
        if not secs:
            print("need epochs >= 2 for a steady-state row"); continue
        per_epoch = sum(secs) / len(secs)
        # train steps drop the ragged tail (drop_last)
        n_steps = args.n // args.batch_size
        mols = n_steps * args.batch_size
        print(
            f"device_pair_feats={mode}: steady epoch {per_epoch:.2f}s "
            f"(epochs {steady[0]['epoch']}..{steady[-1]['epoch']}), "
            f"{mols / per_epoch:.1f} mols/s end-to-end "
            f"(train {mols} mols + full val sweep per epoch)"
        )


if __name__ == "__main__":
    main()
