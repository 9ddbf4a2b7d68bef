"""Logging + metric sinks.

The reference logs to ``log.txt`` + stderr (``prototype/utils/misc.py:96-128``)
and to wandb on rank 0 (``example/clip_fdt/train_solver.py:169-183``).  Here we
provide the same file/stderr logger plus a dependency-free JSON-lines metric
writer (wandb-compatible schema: one ``{"step": .., "<name>": ..}`` object per
line) that tools can tail or import.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Mapping

_LOGGER_NAME = "ilvlm"
_initialized = False


def create_logger(log_file: str | None = None, level=logging.INFO) -> logging.Logger:
    """Create the root framework logger writing to stderr and optionally a file."""
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    if not _initialized:
        fmt = logging.Formatter(
            "%(asctime)s %(levelname)s [%(name)s] %(message)s", "%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        logger.propagate = False
        _initialized = True
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    if name:
        return logging.getLogger(_LOGGER_NAME).getChild(name)
    return logging.getLogger(_LOGGER_NAME)


class MetricsWriter:
    """Append-only JSONL metric sink (stand-in for the reference's wandb use).

    Every ``log`` call writes one JSON object with a wall-clock timestamp and
    the training step, e.g.::

        {"ts": 1699999999.5, "step": 100, "loss_all": 4.2, "lr": 1e-4}
    """

    def __init__(self, path: str | None, enabled: bool = True):
        self.path = path
        self.enabled = enabled and path is not None
        self._fh = None
        if self.enabled:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, metrics: Mapping[str, Any], step: int | None = None):
        if not self.enabled:
            return
        rec = {"ts": round(time.time(), 3)}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            rec[k] = _to_scalar(v)
        self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def _to_scalar(v):
    try:
        import numpy as np

        if hasattr(v, "item") and getattr(v, "size", 1) == 1:
            return v.item()
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
    except Exception:
        pass
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)
