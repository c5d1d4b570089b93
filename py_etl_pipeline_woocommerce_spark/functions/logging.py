"""Structured logger factory — parity with the reference's
``utils/logging.py:1-12`` (``get_logger`` with a rich console
handler), on stdlib logging so the engine adds no dependencies.

Spark executors log through log4j on the JVM side; this logger is for
driver-side flow orchestration (``plans/woo_flow.py`` run summaries,
extract-layer retries) where Python stdout is the right sink.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(levelname)-7s %(name)s — %(message)s"
_DATEFMT = "%H:%M:%S"


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    """Named logger with one stream handler, idempotent per name —
    repeated calls (Streamlit reruns, notebook re-executions) must not
    stack duplicate handlers."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
        logger.addHandler(handler)
        logger.propagate = False
        # level is set ONCE, at creation: a later library call with
        # the INFO default must not silently downgrade a logger the
        # application configured at DEBUG (true idempotence)
        logger.setLevel(level)
    return logger
