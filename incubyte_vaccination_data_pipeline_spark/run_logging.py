"""Per-run timestamped log-file sink (C5 parity).

The reference configures a ``logs/etl_pipeline_{YYYYmmdd_HHMMSS}.log``
file handler plus a console handler at import time (``main.py:13-28``,
``src/validators/data_validator.py:11-23``). The engine keeps the same
observable convention — one timestamped file per run, same record
format — but configures it from the CLI entry instead of at library
import (a library mutating global logging config on import is an
anti-pattern; tests and embedding applications own their own logging).
"""

from __future__ import annotations

import logging
import os
from datetime import datetime

LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_run_logging(
    log_dir: str = "logs",
    prefix: str = "etl_pipeline",
    level: int = logging.INFO,
) -> str:
    """Attach a per-run timestamped file handler (and a console
    handler) to the root logger; returns the log-file path. Mirrors
    the reference's ``logs/etl_pipeline_{ts}.log`` convention."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(
        log_dir, f"{prefix}_{datetime.now().strftime('%Y%m%d_%H%M%S')}.log"
    )
    handlers: list[logging.Handler] = [
        logging.FileHandler(path),
        logging.StreamHandler(),
    ]
    fmt = logging.Formatter(LOG_FORMAT)
    root = logging.getLogger()
    root.setLevel(level)
    for h in handlers:
        h.setFormatter(fmt)
        root.addHandler(h)
    return path
