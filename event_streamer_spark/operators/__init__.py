"""Operator library: the declared query surface (SURVEY.md §2).

Importing this package registers every query into
``event_streamer_spark.operators.registry.REGISTRY`` — the single source
of truth consumed by ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from event_streamer_spark.operators import registry  # noqa: F401
from event_streamer_spark.operators import relational  # noqa: F401
from event_streamer_spark.operators import relational2  # noqa: F401
from event_streamer_spark.operators import relational3  # noqa: F401
from event_streamer_spark.operators import events  # noqa: F401
from event_streamer_spark.operators import windows  # noqa: F401
from event_streamer_spark.operators import dedup  # noqa: F401
from event_streamer_spark.operators import text  # noqa: F401
from event_streamer_spark.operators import similarity  # noqa: F401
from event_streamer_spark.operators import multimodal  # noqa: F401
from event_streamer_spark.operators import multimodal_gif  # noqa: F401
from event_streamer_spark.operators import curation  # noqa: F401
from event_streamer_spark.operators import clustering  # noqa: F401
from event_streamer_spark.operators import text2  # noqa: F401
from event_streamer_spark.operators import temporal  # noqa: F401
from event_streamer_spark.operators import pipeline  # noqa: F401
from event_streamer_spark.operators import analytics  # noqa: F401
from event_streamer_spark.operators import tpch  # noqa: F401
from event_streamer_spark.operators import sketches  # noqa: F401
from event_streamer_spark.operators import bpe  # noqa: F401
from event_streamer_spark.operators import validation  # noqa: F401
from event_streamer_spark.operators import integrity  # noqa: F401
from event_streamer_spark.operators import journey  # noqa: F401
from event_streamer_spark.operators import graph  # noqa: F401
from event_streamer_spark.operators import er  # noqa: F401
from event_streamer_spark.operators import basket  # noqa: F401
from event_streamer_spark.operators import corpus  # noqa: F401
# hybrid composes registered operators: import it LAST
from event_streamer_spark.operators import hybrid  # noqa: F401

REGISTRY = registry.REGISTRY
