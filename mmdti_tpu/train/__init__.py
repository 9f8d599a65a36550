from mmdti_tpu.train.optim import linear_warmup_schedule, make_optimizer  # noqa: F401
from mmdti_tpu.train.trainer import (  # noqa: F401
    Trainer,
    load_checkpoint,
    save_checkpoint,
)
from mmdti_tpu.train.nnmodel import NNModel  # noqa: F401
