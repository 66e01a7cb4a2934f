"""Debug/log levels (SURVEY §2.A A20).

Mirrors the reference's 7-level enum (``interfaces/index.ts:3-11``) and
config-gated ``debug(level, ...)`` helper (``helpers/index.ts:24-43``),
mapped onto Python ``logging``.
"""

from __future__ import annotations

import logging
from enum import IntEnum

logger = logging.getLogger("event_streamer_spark")


class Debug(IntEnum):
    """Levels ordered as the reference orders them: higher = chattier."""

    NONE = 0
    FATAL = 1
    ERROR = 2
    WARN = 3
    INFO = 4
    DEBUG = 5
    TRACE = 6


_PY_LEVEL = {
    Debug.FATAL: logging.CRITICAL,
    Debug.ERROR: logging.ERROR,
    Debug.WARN: logging.WARNING,
    Debug.INFO: logging.INFO,
    Debug.DEBUG: logging.DEBUG,
    Debug.TRACE: logging.DEBUG,
}


def debug(level: Debug, *args) -> None:
    """Log iff the configured debug level admits ``level`` (reference:
    messages print when ``config.debug >= level``)."""
    from event_streamer_spark.config import get_config

    try:
        configured = get_config().debug
    except RuntimeError:
        configured = 0
    if level == Debug.NONE or configured < int(level):
        return
    logger.log(_PY_LEVEL[level], " ".join(str(a) for a in args))
