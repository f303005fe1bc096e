"""Color console logger + scalar metrics writer.

Replaces the reference's colorlog logger (MOFA-Video-Traj/utils/utils.py:32-60)
and accelerate's tensorboard/wandb reporting (train_stage1.py:660-664,1174)
with stdlib logging (ANSI colors when a tty) and a JSONL metrics file —
dependency-free and greppable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

_COLORS = {"DEBUG": "\033[36m", "INFO": "\033[32m", "WARNING": "\033[33m",
           "ERROR": "\033[31m", "CRITICAL": "\033[35m"}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelname, "")
            return f"{color}{msg}{_RESET}"
        return msg


def get_logger(name: str = "mofa_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(_ColorFormatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class MetricsWriter:
    """Append-only JSONL scalar log (one line per step)."""

    def __init__(self, directory: str, filename: str = "metrics.jsonl"):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, filename)
        self._fh = open(self.path, "a")

    def write(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
