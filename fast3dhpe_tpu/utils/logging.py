"""Logging setup. [ref: tools/utils.py:13-27]"""

from __future__ import annotations

import logging

_LOGGER_NAME = "fast3dhpe_tpu"


def setup_logger(level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    ch = logging.StreamHandler()
    ch.setLevel(level)
    ch.setFormatter(logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s"))
    logger.addHandler(ch)
    logger.propagate = False
    return logger
