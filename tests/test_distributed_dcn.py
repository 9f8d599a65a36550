"""Multi-host (DCN) integration: a real 2-process jax.distributed CPU cluster
running one data-parallel reduction through the parallel/mesh.py helpers
(SURVEY §2.4 item 1; VERDICT r1 missing #4).

Each worker process initializes jax.distributed against a shared coordinator,
forces a 4-virtual-device CPU backend (so the global mesh spans 8 devices over
2 processes), feeds its *local* batch shard through local_batch_to_global, and
computes a global-batch mean under jit — the same global-array semantics the
trainer relies on for InfoNCE/FDS.  The result must equal the mean over BOTH
hosts' rows, proving cross-process collective execution.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from mmdti_tpu.parallel.mesh import (
    initialize_distributed, local_batch_to_global, make_mesh,
)

pid = int(sys.argv[1])
initialize_distributed(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = make_mesh((8, 1))
# each host holds a DIFFERENT local shard of the global batch
local = np.arange(8, dtype=np.float32).reshape(8, 1) + 100.0 * pid
batch = local_batch_to_global(mesh, {{"y": local}})

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def global_mean(y):
    return jnp.mean(y)  # jit over the global array: XLA inserts the collective

out = global_mean(batch["y"])
rep = jax.device_get(jax.device_put(out, NamedSharding(mesh, P())))
print("GLOBAL_MEAN", float(rep), flush=True)

# MolTrain's own multi-host feed: every host reads the same GLOBAL batch and
# shard_batch device_puts it against the cross-process 'data' sharding
# (only locally-addressable shards transfer) — docs/API.md scaling section.
from mmdti_tpu.parallel.mesh import shard_batch

full = np.concatenate(
    [np.arange(8, dtype=np.float32).reshape(8, 1),
     np.arange(8, dtype=np.float32).reshape(8, 1) + 100.0]
)
g = shard_batch(mesh, {{"y": full}})
out2 = global_mean(g["y"])
rep2 = jax.device_get(jax.device_put(out2, NamedSharding(mesh, P())))
print("REPLICATED_FEED_MEAN", float(rep2), flush=True)

# device_feed mechanism under multi-host: a resident REPLICATED dataset
# (every host holds the same rows) + an on-device row gather constrained to
# the 'data' axis — the in-jit batching the trainer's device_feed runs
data = np.arange(32, dtype=np.float32).reshape(16, 2)
resident = jax.device_put(data, NamedSharding(mesh, P()))
idx = np.asarray([3, 5, 7, 9, 2, 4, 6, 8], np.int32)

@jax.jit
def gather_mean(d, i):
    rows = jax.lax.with_sharding_constraint(
        jnp.take(d, i, axis=0), NamedSharding(mesh, P("data"))
    )
    return jnp.mean(rows)

out3 = gather_mean(resident, idx)
rep3 = jax.device_get(jax.device_put(out3, NamedSharding(mesh, P())))
print("FEED_GATHER_MEAN", float(rep3), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_global_batch(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO, port=port))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # global batch = host0 rows (0..7) + host1 rows (100..107) -> mean 53.5
    want = float(np.mean(np.concatenate([np.arange(8), np.arange(8) + 100.0])))
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("GLOBAL_MEAN")][0]
        got = float(line.split()[1])
        np.testing.assert_allclose(got, want, rtol=1e-6)
        line = [l for l in out.splitlines()
                if l.startswith("REPLICATED_FEED_MEAN")][0]
        np.testing.assert_allclose(float(line.split()[1]), want, rtol=1e-6)
        # gather of rows [3,5,7,9,2,4,6,8] from arange(32).reshape(16,2)
        data = np.arange(32, dtype=np.float32).reshape(16, 2)
        want_gather = float(np.mean(data[[3, 5, 7, 9, 2, 4, 6, 8]]))
        line = [l for l in out.splitlines()
                if l.startswith("FEED_GATHER_MEAN")][0]
        np.testing.assert_allclose(float(line.split()[1]), want_gather, rtol=1e-6)
