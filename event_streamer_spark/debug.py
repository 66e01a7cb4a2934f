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


class KafkaJSLogLevel(IntEnum):
    """kafkajs client-log levels (reference ``interfaces/index.ts:42``,
    default ``logLevel.NOTHING`` in ``constants/index.ts:20``). Numeric
    values match kafkajs so raw integers from a reference config carry
    over: NOTHING=0, ERROR=1, WARN=2, INFO=4, DEBUG=5."""

    NOTHING = 0
    ERROR = 1
    WARN = 2
    INFO = 4
    DEBUG = 5


_LOG4J_LEVEL = {
    KafkaJSLogLevel.NOTHING: "OFF",
    KafkaJSLogLevel.ERROR: "ERROR",
    KafkaJSLogLevel.WARN: "WARN",
    KafkaJSLogLevel.INFO: "INFO",
    KafkaJSLogLevel.DEBUG: "DEBUG",
}


def kafka_log4j_level(level) -> str:
    """Map a kafkajs ``logLevel`` integer to the log4j level name that
    governs the JVM-side ``org.apache.kafka`` client loggers (the Spark
    analog of the reference passing ``logLevel`` to the kafkajs client,
    ``legacy-producer.ts:101`` / ``legacy-consumer.ts:145``)."""
    return _LOG4J_LEVEL[KafkaJSLogLevel(int(level))]


def apply_kafka_log_level(spark, level) -> bool:
    """Set the JVM ``org.apache.kafka`` logger to the mapped level.

    Best-effort: returns True when the log4j2 Configurator was reachable
    and applied, False otherwise (e.g. no JVM, different logging impl) —
    the client still works either way, exactly as kafkajs logging is
    cosmetic in the reference.
    """
    name = kafka_log4j_level(level)
    try:
        jvm = spark.sparkContext._jvm
        lvl = jvm.org.apache.logging.log4j.Level.toLevel(name)
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.kafka", lvl
        )
        return True
    except Exception:
        return False


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
