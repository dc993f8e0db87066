"""Structured, multi-host-aware logging.

The reference's only observability is tqdm bars (SURVEY.md §5).  Here:
``get_logger`` emits on process 0 only (quiet workers on a pod), and
``log_metrics`` appends JSON-lines metric records (the machine-readable
side channel the experiment driver and benches write).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Mapping


def _is_main_process() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "oco") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO if _is_main_process()
                        else logging.WARNING)
        logger.propagate = False
    return logger


def log_metrics(path: str, record: Mapping) -> None:
    """Append one JSON line (timestamped) to a metrics file; process 0 only."""
    if not _is_main_process():
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps({"ts": time.time(), **record}) + "\n")
