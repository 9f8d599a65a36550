"""Device mesh + sharding helpers.

The reference is single-GPU (/root/reference/tasks/trainer.py:64-65, SURVEY
§2.4); distributed execution here is new TPU-native capability: a
('data', 'model') mesh where batches shard over 'data' (gradients all-reduced
over ICI by XLA) and, optionally, attention-head/FFN weights shard over
'model' (tensor parallelism).  Because the train step is jit'd over global
arrays, the InfoNCE / CT in-batch similarity matrices and FDS bucket
statistics automatically keep *global-batch* semantics — XLA inserts the
all-gathers/psums (SURVEY §2.4 items 2-3).

Multi-host: call jax.distributed.initialize() before building the mesh; each
host feeds its local shard via make_array_from_process_local_data.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization.  Call once per host before building
    the mesh; afterwards jax.devices() spans the pod slice and each host feeds
    its local batch shard (jax.make_array_from_process_local_data)."""
    import jax.distributed

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def local_batch_to_global(mesh: Mesh, batch: dict) -> dict:
    """Assemble per-host local batch shards into global arrays (multi-host)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


# ---- kernel mesh registry ---------------------------------------------------
# pallas_call has no GSPMD partitioning rule: inside a batch-sharded jit'd
# program, the mosaic custom-calls would force XLA to all-gather their
# operands (replicating the [B,H,N,N] pair chain and destroying DP scaling)
# or fail to lower.  The fused-kernel wrappers therefore wrap themselves in
# jax.shard_map over the active mesh, which runs one kernel instance per
# shard on local shapes.  The mesh is registered here by whoever owns it
# (Trainer at fit/predict entry, MolServe at dispatch, the dryrun) and read
# by the kernel wrappers at trace time; a size-1 mesh registers as None so
# the single-chip path is byte-identical to the unmeshed one.
#
# The registry is THREAD-LOCAL: jit tracing happens on the thread that
# dispatches, and MolServe dispatches from HTTP-handler/DynamicBatcher
# threads while a Trainer may be fitting on the main thread — a global
# would let one clobber the other's mesh between registration and trace.
# Each owner re-asserts its mesh at every entry point on its own thread,
# so per-thread state is exactly "the mesh of the component driving this
# thread".  A thread that never registered reads None (unmeshed kernels) —
# the same behavior as before the registry existed.

_TLS = threading.local()


def set_kernel_mesh(mesh: Optional[Mesh], force: bool = False) -> None:
    """Register the mesh the fused Pallas kernels should shard over on THIS
    thread (None, or a mesh of total size 1, disables kernel sharding).

    force=True keeps a size-1 mesh registered, routing the kernels through
    jax.shard_map even on a single chip.  Production never wants this (the
    unmeshed path is byte-identical and skips the shard_map plumbing), but
    it is the only way one real TPU can execute the compiled-Mosaic-under-
    shard_map lowering that multi-chip runs use —
    scripts/shardmap_chip_probe.py + tests/test_pallas_mesh.py use it to
    close that composition gap (VERDICT r4 #3)."""
    if mesh is not None and mesh.size == 1 and not force:
        mesh = None
    _TLS.mesh = mesh


def get_kernel_mesh() -> Optional[Mesh]:
    return getattr(_TLS, "mesh", None)


class kernel_mesh_scope:
    """Context manager for tests: register a mesh, restore the prior one."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        self.prev = get_kernel_mesh()
        set_kernel_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_kernel_mesh(self.prev)
        return False


def make_mesh(mesh_shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """mesh_shape = (data, model); default all devices on the data axis.

    A shape covering FEWER devices than available takes the first data*model
    devices (e.g. mesh_shape=(1, 1) debugs single-device semantics on an
    8-chip host, or (4, 1) leaves chips free for a colocated job)."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices), 1)
    d, m = mesh_shape
    if d * m > len(devices):
        raise ValueError(f"mesh shape {mesh_shape} needs {d * m} devices; only {len(devices)} available")
    arr = np.asarray(devices[: d * m]).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put every array with the leading axis sharded over 'data'.

    One device_put call for the whole tree: per-array puts each cost a
    host->device round trip, which adds up on thin tunnel links (CLAUDE.md:
    H2D is ~20-50MB/s with ~ms fixed cost per transfer here)."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


# ---- tensor-parallel parameter partitioning rules ---------------------------
# Applied by path-suffix matching on the flattened param tree.  Dense kernels
# are [in, out]; sharding the out dim of fc1/qkv and the in dim of fc2/out_proj
# keeps activations sharded by head across the 'model' axis.
TP_RULES: Sequence[Tuple[Tuple[str, ...], P]] = (
    (("in_proj", "kernel"), P(None, MODEL_AXIS)),
    (("out_proj", "kernel"), P(MODEL_AXIS, None)),
    (("fc1", "kernel"), P(None, MODEL_AXIS)),
    (("fc2", "kernel"), P(MODEL_AXIS, None)),
    (("intermediate", "kernel"), P(None, MODEL_AXIS)),
    (("output", "kernel"), P(MODEL_AXIS, None)),
    (("attn_query", "kernel"), P(None, MODEL_AXIS)),
    (("attn_key", "kernel"), P(None, MODEL_AXIS)),
    (("attn_value", "kernel"), P(None, MODEL_AXIS)),
    (("attn_output", "kernel"), P(MODEL_AXIS, None)),
    (("query", "kernel"), P(None, MODEL_AXIS)),
    (("key", "kernel"), P(None, MODEL_AXIS)),
    (("value", "kernel"), P(None, MODEL_AXIS)),
)


def param_sharding(mesh: Mesh, params) -> object:
    """NamedSharding tree for params: TP rules over 'model', else replicated.

    With mesh model-dim 1 this is full replication (pure DP)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if mesh.shape[MODEL_AXIS] > 1:
            for suffix, spec in TP_RULES:
                if keys[-len(suffix):] == suffix:
                    return spec
        return P()

    specs = {path: NamedSharding(mesh, spec_for(path)) for path, _ in flat}
    leaves = [specs[path] for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)
