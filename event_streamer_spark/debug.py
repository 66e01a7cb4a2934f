"""Debug/log levels (SURVEY §2.A A20).

Mirrors the reference's enum (``interfaces/index.ts:3-11``) with the
SAME numeric values (TRACE=0 … FATAL=5, NONE=6) and the same gate
direction (``helpers/index.ts:24-43``: print when
``configLevel <= level`` and the configured value is neither unset nor
``False``) — so raw integer ``debug`` values carried over from a
reference config select the same verbosity here. Mapped onto Python
``logging``.
"""

from __future__ import annotations

import logging
from enum import IntEnum

logger = logging.getLogger("event_streamer_spark")


class Debug(IntEnum):
    """Reference numeric values: lower = chattier; NONE disables."""

    TRACE = 0
    DEBUG = 1
    INFO = 2
    WARN = 3
    ERROR = 4
    FATAL = 5
    NONE = 6


_PY_LEVEL = {
    Debug.TRACE: logging.DEBUG,
    Debug.DEBUG: logging.DEBUG,
    Debug.INFO: logging.INFO,
    Debug.WARN: logging.WARNING,
    Debug.ERROR: logging.ERROR,
    Debug.FATAL: logging.CRITICAL,
}


def debug(level: Debug, *args) -> None:
    """Log iff the configured level admits ``level`` (reference: print
    when ``configLevel <= level``; unset/``False``/``NONE`` → silent)."""
    from event_streamer_spark.config import get_config

    try:
        configured = get_config().debug
    except RuntimeError:
        return
    if configured is None or configured is False:
        return
    if level == Debug.NONE or int(configured) > int(level):
        return
    logger.log(_PY_LEVEL[level], " ".join(str(a) for a in args))
