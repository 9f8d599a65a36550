"""Dataset + batch collation with static-shape padding for XLA.

Replaces the reference's torch Dataset/DataLoader/collate stack
(/root/reference/models/nnmodel.py:245-287, models/mm_model.py:645-682,
tasks/trainer.py:535-556) with a numpy loader.  Collation semantics match
batch_collate_fn: pad src_tokens with the dictionary pad index, src_distance
with 0.0, src_edge_type with the pad index, stack weights, tokenize the
SMILES strings into input_ids/attention_mask, and return (features, labels).

TPU-specific change: batches are padded to *static* shapes.  'dataset' mode
pads every batch to the dataset-wide max lengths (one XLA compilation);
'bucket' mode pads to per-batch buckets from a small fixed set (few
compilations, less padding waste).  pair_feats='device' ships padded
[B,N,3] coords instead of the O(N^2) distance/edge arrays; the model
reconstructs those on device (ops/pair_feats.py) with identical semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from mmdti_tpu.utils.padding import (
    DEFAULT_ATOM_BUCKETS,
    DEFAULT_SMILES_BUCKETS,
    bucket_length,
    pad_1d_tokens,
    pad_2d,
    pad_coords,
)


class MolDataset:
    """(features, labels) pairs; features are the per-sample dicts produced by
    ConformerGen with 'smile' and 'weights' attached."""

    def __init__(self, features: Sequence[Dict[str, Any]], labels=None):
        self.features = list(features)
        if labels is None:
            labels = np.zeros((len(self.features), 1), dtype=np.float32)
        self.labels = np.asarray(labels)

    def __len__(self) -> int:
        return len(self.features)

    def __getitem__(self, idx: int):
        return self.features[idx], self.labels[idx]


class BatchCollator:
    def __init__(
        self,
        tokenizer,
        pad_idx: int,
        pad_mode: str = "dataset",
        atom_pad: Optional[int] = None,
        smiles_pad: Optional[int] = None,
        atom_buckets: Sequence[int] = DEFAULT_ATOM_BUCKETS,
        smiles_buckets: Sequence[int] = DEFAULT_SMILES_BUCKETS,
        pair_feats: str = "host",
    ):
        if pad_mode not in ("dataset", "fixed", "bucket", "ragged"):
            raise ValueError(
                f"unknown pad_mode {pad_mode!r}: expected 'dataset' (dataset-"
                "wide static shape), 'fixed' (config-wide static shape), "
                "'bucket', or 'ragged' (per-batch, CPU/debug)"
            )
        if pair_feats not in ("host", "device"):
            raise ValueError(
                f"unknown pair_feats {pair_feats!r}: 'host' ships the padded "
                "[B,N,N] distance/edge arrays; 'device' ships [B,N,3] coords "
                "and reconstructs them inside the jit (ops/pair_feats.py)"
            )
        self.tokenizer = tokenizer
        self.pad_idx = pad_idx
        self.pad_mode = pad_mode
        self.pair_feats = pair_feats
        self.atom_pad = atom_pad
        self.smiles_pad = smiles_pad
        self.atom_buckets = tuple(atom_buckets)
        self.smiles_buckets = tuple(smiles_buckets)

    def _atom_target(self, max_len: int) -> Optional[int]:
        # 'fixed' differs from 'dataset' only in WHO chose the pad targets
        # (config-wide constants vs dataset max, train/nnmodel.py) — both pad
        # every batch to one static shape here
        if self.pad_mode in ("dataset", "fixed") and self.atom_pad is not None:
            return self.atom_pad
        if self.pad_mode == "bucket":
            return bucket_length(max_len, self.atom_buckets)
        return None  # ragged per-batch (CPU/debug)

    def _smiles_target(self, max_len: int) -> Optional[int]:
        if self.pad_mode in ("dataset", "fixed") and self.smiles_pad is not None:
            return self.smiles_pad
        if self.pad_mode == "bucket":
            return bucket_length(max_len, self.smiles_buckets)
        return None

    def __call__(self, samples: List[Tuple[Dict[str, Any], Any]]):
        feats = [s[0] for s in samples]
        atom_len = max(len(f["src_tokens"]) for f in feats)
        pad_n = self._atom_target(atom_len)

        batch: Dict[str, np.ndarray] = {
            "src_tokens": pad_1d_tokens(
                [np.asarray(f["src_tokens"], dtype=np.int32) for f in feats],
                self.pad_idx, pad_to_length=pad_n,
            ),
        }
        # MOF batches reconstruct with the MOF semantics (BOS/EOS distance
        # rows zero — mof_pair_feats_from_coords; MOFModel passes
        # pair_mode='mof').  At MOF scales the host pair arrays dominate the
        # input bytes (N up to 512: [B,N,N] fp32+int32 is ~260x the coords),
        # so device reconstruction matters even more than for molecules.
        device_pairs = self.pair_feats == "device"
        if device_pairs:
            # ship [B,N,3] coords; the model reconstructs distance/edge on
            # device (MMModel src_coord path) — ~40x fewer input bytes at
            # N=64 and no O(N^2) host padding work
            batch["src_coord"] = pad_coords(
                [np.asarray(f["src_coord"], dtype=np.float32) for f in feats],
                0.0, pad_to_length=pad_n,
            )
        else:
            batch["src_distance"] = pad_2d(
                [np.asarray(f["src_distance"], dtype=np.float32) for f in feats],
                0.0, pad_to_length=pad_n,
            )
            batch["src_edge_type"] = pad_2d(
                [np.asarray(f["src_edge_type"], dtype=np.int32) for f in feats],
                self.pad_idx, pad_to_length=pad_n,
            )
        if "weights" in feats[0]:
            batch["weights"] = np.stack(
                [np.asarray(f["weights"], dtype=np.float32).reshape(-1) for f in feats]
            )

        # MOF auxiliary inputs (reference batch_collate_fn_mof,
        # models/mm_model.py:619-644)
        if "gas_id" in feats[0]:
            batch["gas_id"] = np.asarray([f["gas_id"] for f in feats], dtype=np.int32)
        for key in ("gas_attr", "temperature", "pressure"):
            if key in feats[0]:
                batch[key] = np.asarray([f[key] for f in feats], dtype=np.float32)

        if "smile" in feats[0]:
            smiles = [f["smile"] for f in feats]
            if self.pad_mode in ("dataset", "fixed") and self.smiles_pad is not None:
                tok = self.tokenizer(smiles, pad_to=self.smiles_pad)
                if tok["input_ids"].shape[1] > self.smiles_pad:
                    # 'fixed' guarantees the width even for SMILES longer
                    # than the configured pad (tokenizers only widen)
                    tok = {k: v[:, : self.smiles_pad] for k, v in tok.items()}
            elif self.pad_mode == "bucket":
                probe = self.tokenizer(smiles)  # natural width
                width = probe["input_ids"].shape[1]
                target = bucket_length(width, self.smiles_buckets)
                tok = probe if width == target else self.tokenizer(smiles, pad_to=target)
            else:
                tok = self.tokenizer(smiles)
            batch["input_ids"] = tok["input_ids"].astype(np.int32)
            batch["attention_mask"] = tok["attention_mask"].astype(np.int32)

        labels = np.stack([np.asarray(s[1]) for s in samples])
        return batch, labels


class MolDataLoader:
    """Shuffling, drop-last-capable batch iterator (numpy RNG)."""

    def __init__(
        self,
        dataset: MolDataset,
        batch_size: int,
        collate_fn: BatchCollator,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        """One epoch's sample order (advances the shuffle RNG)."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        self._epoch += 1
        return idx

    def advance_epochs(self, n: int) -> None:
        """Discard n epochs' shuffle draws (resume alignment).

        A resumed fit constructs a fresh loader whose RNG would otherwise
        replay epoch 0's permutation at the resumed epoch — the continued
        run would see a different data order than the uninterrupted one.
        Drawing and discarding the already-trained epochs keeps the
        trajectory identical (the dropout PRNG is global_step-keyed and
        already continuous)."""
        for _ in range(max(int(n), 0)):
            self._epoch_order()

    def __iter__(self):
        idx = self._epoch_order()
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield self.collate_fn([self.dataset[i] for i in sel])

    def epoch_index_matrix(self):
        """One epoch's batches as row indices: ([num_batches, batch_size]
        int32, list of valid row counts).

        Drives the device-resident feed (Trainer device_feed): batch
        composition is IDENTICAL to __iter__ (same RNG draw), but batches are
        assembled on device by gathering rows of the resident dataset arrays
        instead of host collation + transfer.  A trailing partial batch is
        padded by repeating its last index — the index-level equivalent of
        Trainer._pad_to_batch's repeat-last-row padding."""
        idx = self._epoch_order()
        bs = self.batch_size
        nb = len(self)
        rows, valid_ns = [], []
        for b in range(nb):
            sel = idx[b * bs : (b + 1) * bs]
            valid_ns.append(len(sel))
            if len(sel) < bs:
                sel = np.concatenate([sel, np.repeat(sel[-1:], bs - len(sel))])
            rows.append(sel)
        return np.stack(rows).astype(np.int32), valid_ns


class CachedLoader:
    """Materializes a (deterministic) loader's batches on first iteration.

    Used for the validation and FDS-sweep loops, whose batch composition is
    static across epochs — collation + tokenization then happen once instead
    of every epoch."""

    def __init__(self, loader):
        self.loader = loader
        self._cache = None

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        if self._cache is None:
            self._cache = list(self.loader)
        return iter(self._cache)


def collate_dataset(dataset: MolDataset, collate_fn: BatchCollator, chunk: int = 2048):
    """Collate the ENTIRE dataset into full-length arrays (one-time host cost).

    Feeds the device-resident input path: with static dataset/fixed padding
    every chunk collates to the same widths, so the concatenated [n, ...]
    arrays can live on the device and per-step batches become on-device row
    gathers (no per-epoch tokenization/padding, no per-batch H2D transfer).
    """
    if collate_fn.pad_mode not in ("dataset", "fixed"):
        raise ValueError(
            f"collate_dataset needs a static pad_mode ('dataset'/'fixed'); "
            f"got {collate_fn.pad_mode!r} whose widths vary per batch"
        )
    parts = [
        collate_fn([dataset[i] for i in range(s, min(s + chunk, len(dataset)))])
        for s in range(0, len(dataset), chunk)
    ]
    batch = {k: np.concatenate([p[0][k] for p in parts]) for k in parts[0][0]}
    labels = np.concatenate([p[1] for p in parts])
    return batch, labels


def dataset_pad_lengths(
    features: Sequence[Dict[str, Any]],
    tokenizer,
    pad_multiple: int = 16,
    extra_datasets: Sequence[Sequence[Dict[str, Any]]] = (),
) -> Tuple[int, int]:
    """Dataset-wide (atom, smiles) pad targets, rounded up to pad_multiple.

    Computed across train+val so both loops share one compiled shape.
    """
    def up(n):
        return int(-(-n // pad_multiple) * pad_multiple)

    all_feats = list(features)
    for ds in extra_datasets:
        all_feats.extend(ds)
    atom = max(len(f["src_tokens"]) for f in all_feats)
    if any("smile" not in f for f in all_feats):
        # MOF features carry no SMILES stream — there is nothing to tokenize
        # and the collator never consults smiles_pad without a 'smile' key
        return up(atom), 0
    # One batched tokenizer call per chunk (not one per sample), with
    # truncation on — so the pad target is what encode() will actually emit
    # (both tokenizers pad each chunk to its longest row, so the padded width
    # IS the chunk's max encoded length).
    smiles = [f["smile"] for f in all_feats]
    smi = 1
    for i in range(0, len(smiles), 4096):
        enc = tokenizer(smiles[i : i + 4096], truncation=True)
        smi = max(smi, int(np.asarray(enc["input_ids"]).shape[1]))
    return up(atom), up(smi)
