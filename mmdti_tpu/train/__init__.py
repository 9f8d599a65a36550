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

# Persistent XLA compilation cache: the first flagship compile costs 10-70s
# (remote compile through the tunnel; CPU compiles of even small models run
# 30-120s on this host), so fresh processes (bench, finetune, scripts, test
# re-runs) reuse on-disk executables.  Opt out with MMDTI_COMPILE_CACHE=off,
# or point it elsewhere with MMDTI_COMPILE_CACHE=<dir>.
_cache_dir = _os.environ.get(
    "MMDTI_COMPILE_CACHE", _os.path.expanduser("~/.cache/mmdti_tpu_xla")
)
if _cache_dir.lower() not in ("off", "0", ""):
    try:  # fails open: unsupported backends just skip the cache
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover
        pass

from mmdti_tpu.train.optim import linear_warmup_schedule, make_optimizer  # noqa: F401
from mmdti_tpu.train.trainer import (  # noqa: F401
    Trainer,
    load_checkpoint,
    save_checkpoint,
)
from mmdti_tpu.train.nnmodel import NNModel  # noqa: F401
