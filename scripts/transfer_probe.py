"""Measure per-batch host->device input transfer: host vs device pair feats.

The reference ships dense [B,N,N] fp32 distance + int32 edge arrays per batch
(/root/reference/tasks/trainer.py:101-124); with device-side pair
featurization (ops/pair_feats.py) the pipeline ships [B,N,3] coords instead.
This probe times `jax.device_put` + block for both batch styles so the
transfer saving is a measured number, not byte math.  Through the tunnel
(~40MB/s device<->host) the dense pair arrays alone can exceed the 21.4ms
train step — i.e. the difference decides whether training is input-bound.

Usage: python scripts/transfer_probe.py [B] [N] [L] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def batch_styles(B, N, L, vocab=35, pad=1):
    rng = np.random.RandomState(0)
    toks = rng.randint(4, vocab - 1, (B, N)).astype(np.int32)
    common = {
        "src_tokens": toks,
        "input_ids": rng.randint(4, 300, (B, L)).astype(np.int32),
        "attention_mask": np.ones((B, L), np.int32),
    }
    host = dict(common)
    host["src_distance"] = rng.rand(B, N, N).astype(np.float32)
    host["src_edge_type"] = (
        toks[:, :, None].astype(np.int64) * vocab + toks[:, None, :]
    ).astype(np.int32)
    dev = dict(common)
    dev["src_coord"] = rng.randn(B, N, 3).astype(np.float32)
    return {"host_pair_feats": host, "device_pair_feats": dev}


def main():
    import jax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    print(f"backend={jax.default_backend()} B={B} N={N} L={L} reps={reps}")

    import jax.numpy as jnp

    def run(payloads, k):
        """Put k payloads, then hard host sync through a value that depends
        on every array (difference-based timing below subtracts the fixed
        sync cost; block_until_ready alone can lie through the tunnel's
        async dispatch — CLAUDE.md TIMING TRAP)."""
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for p in payloads[:k]:
            dev = jax.device_put(p)
            for v in dev.values():
                acc = acc + v.ravel()[0].astype(jnp.float32)
        float(acc)
        return time.perf_counter() - t0

    for name, batch in batch_styles(B, N, L).items():
        nbytes = sum(v.nbytes for v in batch.values())
        # fresh arrays each rep so no transfer is elided by caching
        payloads = [
            {k: v + 0 if v.dtype != np.float32 else v + np.float32(i)
             for k, v in batch.items()}
            for i in range(reps)
        ]
        run(payloads, 3)  # warmup (compile the sync adds)
        short = run(payloads, reps // 3)
        full = run(payloads, reps)
        dt = (full - short) / (reps - reps // 3)
        print(
            f"{name:18s} {nbytes/1e6:8.3f} MB/batch  {dt*1e3:8.2f} ms/batch  "
            f"{nbytes/dt/1e6:8.1f} MB/s  (difference-based over "
            f"{reps - reps//3} puts)"
        )


if __name__ == "__main__":
    main()
