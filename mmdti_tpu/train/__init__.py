import os as _os

import jax as _jax

# threefry dropout-mask generation costs ~14ms/step on the flagship model on
# v5e (measured); rbg is the TPU-appropriate PRNG.  Opt out with
# MMDTI_PRNG=threefry (e.g. to reproduce keys bit-for-bit across impls).
if _os.environ.get("MMDTI_PRNG", "rbg") == "rbg":
    try:
        _jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # pragma: no cover - very old jax
        pass

from mmdti_tpu.train.optim import linear_warmup_schedule, make_optimizer  # noqa: F401
from mmdti_tpu.train.trainer import (  # noqa: F401
    Trainer,
    load_checkpoint,
    save_checkpoint,
)
from mmdti_tpu.train.nnmodel import NNModel  # noqa: F401
