"""Host-side profile of the per-epoch batch-prep cost (no device needed).

fit_probe measured MolTrain.fit at ~470 mols/s on this 1-core host vs the
1485 mols/s resident-input device step — i.e. the steady-state epoch is
host-bound.  This probe breaks the host cost down per stage so the
optimization target is measured, not guessed:

  * loader+collate: one full epoch of MolDataLoader/BatchCollator iteration
  * tokenize:       the SMILES->ids calls alone
  * atom-pad:       pad_1d_tokens/pad_coords alone
  * stack:          label/weights stacking alone

Usage: python scripts/collate_probe.py [--n 3200] [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--pair-feats", default="device", choices=["device", "host"])
    args = ap.parse_args()

    from mmdti_tpu.chem.conformer import ConformerGen
    from mmdti_tpu.chem.dictionary import Dictionary
    from mmdti_tpu.chem.tokenizer import load_tokenizer
    from mmdti_tpu.data.batching import (
        BatchCollator, MolDataLoader, MolDataset, dataset_pad_lengths,
    )

    rng = np.random.RandomState(0)
    frags = ["C", "CC", "CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1",
             "COC", "CCS", "c1ccncc1", "CC(C)C", "OCCO", "CC#N", "CCCl",
             "C(=O)O", "CCCC"]
    smiles = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 4)))
              for _ in range(args.n)]

    t0 = time.perf_counter()
    feats = ConformerGen(pair_feats=(args.pair_feats == "host")).transform(smiles)
    t_feat = time.perf_counter() - t0
    for f, s in zip(feats, smiles):
        f["smile"] = s
        f["weights"] = np.ones(1, np.float32)
    labels = rng.randn(len(feats), 1).astype(np.float32)

    tokenizer = load_tokenizer(None)
    dictionary = Dictionary.load(None)
    atom_pad, smiles_pad = dataset_pad_lengths(feats, tokenizer, 16)
    print(f"n={len(feats)} featurize={t_feat:.2f}s ({1e3*t_feat/len(feats):.3f} ms/mol) "
          f"atom_pad={atom_pad} smiles_pad={smiles_pad}")

    collator = BatchCollator(
        tokenizer, pad_idx=dictionary.pad(), pad_mode="dataset",
        atom_pad=atom_pad, smiles_pad=smiles_pad, pair_feats=args.pair_feats,
    )
    ds = MolDataset(feats, labels)
    loader = MolDataLoader(ds, args.batch, collator, shuffle=True, drop_last=True)

    # full epoch loop
    for name, fn in [
        ("loader+collate", lambda: [None for _ in loader]),
    ]:
        ts = []
        for _ in range(args.epochs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name:>16}: {t:.3f}s/epoch = {1e3*t/len(feats):.4f} ms/mol "
              f"({len(feats)/t:.0f} mols/s host ceiling)")

    # stage breakdown on the same batches
    idx = np.arange(len(ds))
    batches = [[ds[i] for i in idx[b*args.batch:(b+1)*args.batch]]
               for b in range(len(idx)//args.batch)]

    def stage(name, fn):
        ts = []
        for _ in range(args.epochs):
            t0 = time.perf_counter()
            for bs in batches:
                fn(bs)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name:>16}: {t:.3f}s/epoch = {1e3*t/len(feats):.4f} ms/mol")

    from mmdti_tpu.utils.padding import pad_1d_tokens, pad_coords

    stage("tokenize", lambda bs: tokenizer([s[0]["smile"] for s in bs], pad_to=smiles_pad))
    stage("atom-pad", lambda bs: (
        pad_1d_tokens([np.asarray(s[0]["src_tokens"], dtype=np.int32) for s in bs],
                      dictionary.pad(), pad_to_length=atom_pad),
        pad_coords([np.asarray(s[0]["src_coord"], dtype=np.float32) for s in bs],
                   0.0, pad_to_length=atom_pad),
    ))
    stage("stack", lambda bs: (
        np.stack([np.asarray(s[0]["weights"], dtype=np.float32).reshape(-1) for s in bs]),
        np.stack([np.asarray(s[1]) for s in bs]),
    ))
    stage("full-collate", lambda bs: collator(bs))


if __name__ == "__main__":
    main()
