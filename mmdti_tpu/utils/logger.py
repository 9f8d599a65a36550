"""Singleton logger for the framework.

Mirrors the reference's console+rotating-file logger contract
(/root/reference/utils/base_logger.py:15-87): a named logger writing to the
console and to ./logs/mmdti_tpu_<date>.log with timed rotation.
"""

from __future__ import annotations

import logging
import os
import sys
from logging.handlers import TimedRotatingFileHandler

_LOGGER_NAME = "MMDTI-TPU"
_LOG_DIR = os.environ.get("MMDTI_LOG_DIR", "./logs")
_FMT = "%(asctime)s | %(name)s | %(levelname)s | %(message)s"


def _build_logger() -> logging.Logger:
    lg = logging.getLogger(_LOGGER_NAME)
    if lg.handlers:
        return lg
    lg.setLevel(logging.INFO)
    lg.propagate = False

    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(logging.Formatter(_FMT))
    lg.addHandler(sh)

    if os.environ.get("MMDTI_DISABLE_FILE_LOG", "0") != "1":
        try:
            os.makedirs(_LOG_DIR, exist_ok=True)
            fh = TimedRotatingFileHandler(
                os.path.join(_LOG_DIR, "mmdti_tpu.log"),
                when="D",
                interval=3,
                backupCount=5,
            )
            fh.setFormatter(logging.Formatter(_FMT))
            lg.addHandler(fh)
        except OSError:
            pass
    return lg


logger = _build_logger()
