"""Device-resident input feed (device_feed) + batch/host plumbing.

Split out of trainer.py (round 5).  The fit loop was HOST-bound without
this (~470 of a possible ~1490 mols/s, scripts/fit_probe.py): tokenization,
padding, stacking, and a per-batch H2D transfer through a ~20-50 MB/s
tunnel.  ``DeviceFeedMixin`` collates train+val ONCE, keeps the arrays
resident (replicated) in HBM, and turns per-step batching into on-device
row gathers inside the jit'd scan — a [K, B] int32 index block is the only
per-step transfer.  'auto' engages when padding is static and the
probe-estimated resident bytes fit device_feed_bytes per device.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from mmdti_tpu.data.batching import MolDataLoader, collate_dataset
from mmdti_tpu.losses.registry import target_is_integer
from mmdti_tpu.parallel.mesh import replicated
from mmdti_tpu.utils.logger import logger

_FEATURE_KEYS = (
    "src_tokens", "src_distance", "src_edge_type", "src_coord",
    "input_ids", "attention_mask",
    # MOF auxiliary inputs (models/mof.py MOFModel; absent on molecule data)
    "gas_id", "gas_attr", "pressure", "temperature",
)


def _normalize_device_feed(value):
    """Map every accepted device_feed spelling onto {'auto', True, False}.

    YAML/CLI round trips turn booleans into strings; a truthy 'false' or
    'off' silently behaving as auto (or a 'true' that only *requests* the
    feed) would be a misconfiguration the user never sees."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v == "auto":
            return "auto"
        if v in ("true", "on", "1", "yes"):
            return True
        if v in ("false", "off", "0", "no", ""):
            return False
        raise ValueError(
            f"device_feed={value!r} not understood: expected 'auto', "
            "True/'true'/'on', or False/'false'/'off'"
        )
    if value is None:
        return False
    if isinstance(value, (bool, int)):
        return bool(value)
    raise ValueError(f"device_feed={value!r} not understood")



class DeviceFeedMixin:
    """Input-feed decisions + host<->device batch plumbing for the Trainer."""

    def _split_batch(self, batch: Dict[str, np.ndarray]):
        feats = {k: batch[k] for k in _FEATURE_KEYS if k in batch}
        weights = batch.get("weights")
        return feats, weights

    def _feed_engaged(self, collate_fn, *datasets) -> bool:
        """Decide whether the device-resident input feed runs this fit.

        device_feed=False: never.  True: forced (static padding required —
        per-batch bucket widths cannot live in one resident array).  'auto'
        (default): engage when padding is static and the estimated resident
        bytes (probe-collation extrapolation over all datasets) fit
        device_feed_bytes per device."""
        mode = self.device_feed  # {'auto', True, False} post-normalization
        if mode is False:
            return False
        static = getattr(collate_fn, "pad_mode", None) in ("dataset", "fixed")
        if not static:
            if mode is True:
                raise ValueError(
                    "device_feed=True requires static padding (pad_mode "
                    f"'dataset' or 'fixed'); got {getattr(collate_fn, 'pad_mode', None)!r}"
                )
            return False
        if mode is True:
            return True
        total = 0
        for ds in datasets:
            if len(ds) == 0:
                continue
            # under static pads every collated row has identical bytes, so a
            # tiny probe gives the EXACT per-row size
            probe_n = min(len(ds), 8)
            batch, labels = collate_fn([ds[i] for i in range(probe_n)])
            feats, weights = self._split_batch(batch)
            per = sum(a.nbytes for a in feats.values()) + labels.nbytes
            if weights is not None:
                per += weights.nbytes
            total += int(per / probe_n * len(ds))
        if total > self.device_feed_bytes:
            logger.info(
                "device_feed auto-disabled: ~%.0f MB resident inputs exceed "
                "the %.0f MB cap (device_feed_bytes)",
                total / 1e6, self.device_feed_bytes / 1e6,
            )
            return False
        return True

    @staticmethod
    def _row_bucket(n: int) -> int:
        """Resident-array row count, bucketed to multiples of 128.

        Every jit signature embeds the resident arrays' shapes, so a raw
        per-dataset row count makes EACH CV fold / protocol seed (whose
        scaffold splits differ by a handful of molecules) a fresh compile of
        the whole epoch program — minutes of remote compile per fold on slow
        compile-server days (observed 15+ min, round 5).  Bucketing to 128
        rows makes typical folds collide onto one executable; the batch
        index matrices only ever reference real rows, so pad rows are
        gather-dead zeros."""
        return max(128, -(-n // 128) * 128)

    def _dataset_to_device(self, dataset, collate_fn):
        """Collate the whole dataset once and place it resident (replicated)
        on the mesh, rows padded up to the 128 bucket.  Returns (feats,
        labels, weights) device arrays plus the UNPADDED host label rows
        (for metrics / truth columns)."""
        batch, labels = collate_dataset(dataset, collate_fn)
        feats, weights = self._split_batch(batch)
        labels_h = self._labels_host(labels)
        w_h = (
            np.asarray(weights, np.float32)
            if weights is not None
            else np.ones((labels.shape[0], 1), np.float32)
        )
        pad_to = self._row_bucket(labels_h.shape[0])

        def pad_rows(x):
            n = x.shape[0]
            if n == pad_to:
                return x
            return np.concatenate(
                [x, np.zeros((pad_to - n,) + x.shape[1:], x.dtype)], axis=0
            )

        feats = {k: pad_rows(np.asarray(v)) for k, v in feats.items()}
        feats_d, labels_d, w_d = jax.device_put(
            (feats, pad_rows(labels_h), pad_rows(w_h)), replicated(self.mesh)
        )
        return feats_d, labels_d, w_d, labels

    def build_eval_device_data(self, model, dataset, collate_fn, loss_fn,
                               activation_fn, eval_sweep=None):
        """Assemble the device-resident eval bundle consumed by
        predict(device_data=...): resident arrays + batch index matrix +
        the jit'd sweep."""
        feats_d, labels_d, _, labels_host = self._dataset_to_device(
            dataset, collate_fn
        )
        idx, valid_ns = MolDataLoader(
            dataset, self.batch_size, collate_fn
        ).epoch_index_matrix()
        idx_d, ns_d = jax.device_put(
            (idx, np.asarray(valid_ns, np.int32)), replicated(self.mesh)
        )
        return {
            "feats": feats_d, "labels": labels_d,
            "idx": idx_d, "valid_ns_dev": ns_d, "valid_ns": valid_ns,
            "labels_host": labels_host,
            "eval_sweep": eval_sweep
            or self._memo(
                ("sweep", id(model), id(loss_fn), id(activation_fn), False),
                (model, loss_fn, activation_fn),
                lambda: self.build_eval_sweep(model, loss_fn, activation_fn),
            ),
        }

    def _pad_to_batch(self, batch, labels):
        """Pad a trailing partial batch up to batch_size (static shapes)."""
        n = labels.shape[0]
        if n == self.batch_size:
            return batch, labels, n
        reps = self.batch_size - n

        def pad(x):
            return np.concatenate([x, np.repeat(x[-1:], reps, axis=0)], axis=0)

        return jax.tree.map(pad, batch), pad(labels), n

    def _labels_host(self, labels: np.ndarray) -> np.ndarray:
        """Dtype-normalized host array (device placement happens in the
        caller's batched device_put)."""
        dt = np.int32 if target_is_integer(self.task) else np.float32
        return np.asarray(labels, dt)


    def _put_batch_on_device(self, bsh, item):
        """H2D transfer for one batch (runs inside the prefetch window).

        ONE device_put for the whole (feats, labels, weights) tree —
        separate puts each pay the tunnel's fixed per-transfer cost."""
        batch, labels = item
        feats, weights = self._split_batch(batch)
        labels_h = self._labels_host(labels)
        w_h = (
            np.asarray(weights, np.float32)
            if weights is not None
            else np.ones((labels.shape[0], 1), np.float32)
        )
        return jax.device_put((feats, labels_h, w_h), bsh)
