from mmdti_tpu.losses.infonce import InfoNCE, info_nce_loss  # noqa: F401
from mmdti_tpu.losses.contrastive import (  # noqa: F401
    CT_REGISTRY,
    ct_multi,
    ct_regress,
    ct_single,
)
from mmdti_tpu.losses.fds import (  # noqa: F401
    fds_bucket_params,
    fds_epoch_update,
    fds_kernel_window,
    fds_smooth,
    fds_update_last_epoch_stats,
    fds_update_running_stats,
    init_fds_state,
)
from mmdti_tpu.losses.registry import (  # noqa: F401
    ACTIVATION_REGISTRY,
    LOSS_REGISTRY,
    resolve_loss,
    resolve_output_dim,
    target_is_integer,
)
from mmdti_tpu.losses import zoo  # noqa: F401
