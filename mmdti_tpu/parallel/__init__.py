from mmdti_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicate,
    replicated,
    shard_batch,
)
