from mmdti_tpu.utils.logger import logger  # noqa: F401
from mmdti_tpu.utils.metrics import Metrics, METRICS_REGISTRY, DEFAULT_METRICS  # noqa: F401
from mmdti_tpu.utils.padding import (  # noqa: F401
    pad_1d_tokens,
    pad_2d,
    pad_coords,
    bucket_length,
)
