from mmdti_tpu.data.reader import MolDataReader  # noqa: F401
from mmdti_tpu.data.scaler import TargetScaler  # noqa: F401
from mmdti_tpu.data.weights import (  # noqa: F401
    calculate_weights,
    compute_sample_weights,
    get_lds_kernel_window,
)
from mmdti_tpu.data.hub import DataHub  # noqa: F401
from mmdti_tpu.data.batching import (  # noqa: F401
    BatchCollator,
    MolDataLoader,
    MolDataset,
    dataset_pad_lengths,
)
