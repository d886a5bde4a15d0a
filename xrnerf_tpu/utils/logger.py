"""Logging: stdlib logging configured once per process.

Replaces the reference's mmcv ``get_logger`` wrapper
(``/root/reference/xrnerf/utils/logger.py:9-26``). Multi-host aware: only
jax process 0 logs at the requested level by default; other processes log
errors only (the reference gated on torch.distributed rank instead).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_INITIALIZED: set[str] = set()


def get_logger(
    name: str = "xrnerf_tpu",
    log_file: Optional[str] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _INITIALIZED:
        return logger

    try:
        import jax

        is_main = jax.process_index() == 0
    except Exception:
        is_main = True

    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if log_file is not None and is_main:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        handlers.append(logging.FileHandler(log_file, "a"))

    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    for h in handlers:
        h.setFormatter(fmt)
        logger.addHandler(h)
    logger.setLevel(level if is_main else logging.ERROR)
    logger.propagate = False
    _INITIALIZED.add(name)
    return logger
