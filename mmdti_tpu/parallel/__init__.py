from mmdti_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    get_kernel_mesh,
    kernel_mesh_scope,
    make_mesh,
    param_sharding,
    replicate,
    replicated,
    set_kernel_mesh,
    shard_batch,
)
