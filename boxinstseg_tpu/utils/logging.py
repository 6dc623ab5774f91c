"""Logging (reference: mmdet/utils/logger.py get_root_logger)."""
from __future__ import annotations

import logging
import sys
from typing import Optional

_initialized = set()


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO,
                    name: str = 'boxinstseg_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file, 'a')
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _initialized.add(name)
    return logger
