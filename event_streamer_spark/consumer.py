"""ConsumerRouter: ``(topic, code)`` predicate dispatch, Spark-first.

Re-expression of the reference consumer
(``src/consumer/legacy-consumer.ts``; SURVEY.md §2.A A1/A3/A5-A7/A14-A16,
§3.2-3.3). Parity points:

* **Route table (A6)** — ``add()`` accepts topic(s) × event_name(s) ×
  callback or a :class:`Route`, expands the cross product into unit
  routes, normalizing event names to UpperCamelCase
  (reference ``legacy-consumer.ts:39-71``).
* **Dispatch predicate (A5)** — a route matches iff
  ``topic == route.topic AND (route.event_name IS NULL OR
  route.event_name == content["code"])``; one message can match many
  routes (reference ``legacy-consumer.ts:92``).
* **Testing injection (A19)** — ``input()`` computes ``code``, merges it
  into the payload (NO ``createdAt``/``appName`` enrichment — deliberate
  reference asymmetry, ``legacy-consumer.ts:73-81``), and awaits matching
  callbacks **sequentially**, passing the real ``emit``.
* **Error isolation (A16)** — live dispatch swallows handler errors
  (logged, never fail the batch; at-least-once).
* **Strategies (A14/A15)** — ``'topic'``: bounded concurrency per topic
  (Spark: micro-batch admission via ``maxOffsetsPerTrigger``);
  ``'one-by-one'``: total order (rows sorted by (partition, offset),
  processed serially inside ``foreachBatch``).

Two execution paths:

1. **Imperative handlers** (reference-parity): arbitrary Python callbacks
   run driver-side over each micro-batch — the reference is a single-node
   microservice consumer, so this is the same execution model with
   Spark's Kafka source underneath (offset tracking, checkpointing →
   upgrade to restartable at-least-once).
2. **Declarative transforms** (the scale path): a route whose handler is
   a ``DataFrame -> DataFrame`` transform compiles to
   ``filter(predicate) |> transform |> sink`` and runs fully distributed
   — this is what survives 100 TB / 1000 executors.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from event_streamer_spark.config import get_config
from event_streamer_spark.helpers import get_parsed_json, to_array, to_upper_camel_case
from event_streamer_spark.producer import emit

logger = logging.getLogger(__name__)

Handler = Callable[[dict, Callable], Any]
Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Route:
    """One unit route (reference ``interfaces/index.ts:67-71``).

    ``event_name is None`` → match every event on the topic.
    ``callback`` is an imperative ``(content, emit)`` handler;
    ``transform`` is the declarative DataFrame path (engine extension).
    """

    topic: str
    event_name: Optional[str] = None
    callback: Optional[Handler] = None
    transform: Optional[Transform] = None


class ConsumerRouter:
    """Routes messages to handlers by ``(topic, code)`` (SURVEY §3.2)."""

    def __init__(self) -> None:
        from event_streamer_spark.config import warn_deprecation

        warn_deprecation(
            "ConsumerRouter is deprecated. Use SchemaRegistryConsumerRouter "
            "for Schema Registry support."
        )
        self.routes: list[Route] = []
        self._queries: list = []  # active streaming queries

    # -- route registration (A6) --------------------------------------

    def add(
        self,
        param1: Union[str, Sequence[str], Route],
        param2: Union[str, Sequence[str], Handler, None] = None,
        handler: Optional[Handler] = None,
        *,
        transform: Optional[Transform] = None,
    ) -> None:
        """Register route(s); cross-product expansion of topics × events.

        Overloads (reference ``legacy-consumer.ts:39-71``)::

            add(topic, handler)
            add([topics], handler)
            add(topic, event_name, handler)
            add(topic, [event_names], handler)
            add([topics], [event_names], handler)
            add([topics], event_name, handler)
            add(Route(...))

        Event names are normalized to UpperCamelCase at registration.
        ``transform=`` registers a declarative DataFrame route instead of
        an imperative callback (engine extension, see module docstring).
        """
        if isinstance(param1, Route):
            topics = [param1.topic]
            event_names: list[Optional[str]] = [
                to_upper_camel_case(param1.event_name)
                if param1.event_name is not None
                else None
            ]
            callback = param1.callback
            transform = param1.transform
        else:
            topics = to_array(param1)  # type: ignore[arg-type]
            if isinstance(param2, str):
                event_names = [to_upper_camel_case(param2)]
                callback = handler
            elif isinstance(param2, (list, tuple)):
                event_names = [to_upper_camel_case(e) for e in param2]
                callback = handler
            elif callable(param2):
                event_names = [None]
                callback = param2
            else:
                event_names = [None]
                callback = handler

        for topic in topics:
            for event_name in event_names:
                route = Route(
                    topic=topic,
                    event_name=event_name,
                    callback=callback,
                    transform=transform,
                )
                logger.info("Adding route %s", route)
                self.routes.append(route)

    def topics(self) -> list[str]:
        """Distinct routed topics, first-seen order (A1 source pruning)."""
        seen: dict[str, None] = {}
        for route in self.routes:
            seen.setdefault(route.topic, None)
        return list(seen)

    # -- testing-mode injection (A19) ----------------------------------

    def input(self, output: Union[dict, Any]) -> None:
        """Inject one event in testing mode (reference ``legacy-consumer.ts:73-81``).

        Computes ``code = UpperCamelCase(event_name or topic)``, merges it
        into the payload **without** envelope enrichment (reference
        asymmetry, SURVEY §3.3), filters routes with the A5 predicate and
        invokes callbacks **sequentially** with ``(content, emit)``.
        """
        config = get_config()
        if not config.only_testing:
            raise RuntimeError("input() is only available with only_testing=True")
        if isinstance(output, dict):
            topic = output["topic"]
            event_name = output.get("event_name", output.get("eventName"))
            data = output["data"]
        else:  # producer.Output
            topic, event_name, data = output.topic, output.event_name, output.data

        code = to_upper_camel_case(event_name if event_name is not None else topic)
        matched = [
            r
            for r in self.routes
            if r.topic == topic and (r.event_name is None or r.event_name == code)
        ]
        for route in matched:
            if route.callback is not None:
                route.callback({**data, "code": code}, emit)

    # -- batch/driver-side dispatch (A5 + A7 + A16) --------------------

    def dispatch_message(self, topic: str, content: Optional[dict]) -> int:
        """Dispatch one parsed message to all matching routes.

        Corrupt (``None``) content is silently dropped (A3). Handler
        errors are logged and swallowed (A16 at-least-once parity).
        Returns the number of matched routes.
        """
        if content is None:
            return 0
        matched = [
            r
            for r in self.routes
            if r.topic == topic
            and (r.event_name is None or r.event_name == content.get("code"))
        ]
        for route in matched:
            if route.callback is None:
                continue
            try:
                route.callback(content, emit)
            except Exception:  # noqa: BLE001 — reference swallows (A16)
                logger.exception("Handler error on route %s", route)
        return len(matched)

    # -- declarative compilation (the scale path) ----------------------

    @staticmethod
    def route_predicate(route: Route, topic_col: str = "topic", code_col: str = "code"):
        """The A5 predicate as a Column expression."""
        pred = F.col(topic_col) == F.lit(route.topic)
        if route.event_name is not None:
            pred = pred & (F.col(code_col) == F.lit(route.event_name))
        return pred

    def compile(
        self, df: DataFrame, topic_col: str = "topic", code_col: str = "code"
    ) -> list[tuple[Route, DataFrame]]:
        """Compile routes over a (streaming or batch) DataFrame.

        Each route becomes ``df.filter(predicate)`` (+ its transform).
        All branches share the one source scan; Catalyst/AQE handle the
        physical plan. N branches = N concurrent queries (A16).
        """
        out = []
        for route in self.routes:
            branch = df.filter(self.route_predicate(route, topic_col, code_col))
            if route.transform is not None:
                branch = route.transform(branch)
            out.append((route, branch))
        return out

    # -- streaming start (A1/A3/A14/A15) -------------------------------

    def topic_limits(self) -> dict[str, Optional[int]]:
        """A14: per-topic in-flight caps from config.

        Maps the reference's ``maxMessagesPerSpecificTopic`` /
        ``maxMessagesPerTopic`` (default 20, ``'unlimited'`` → None)
        onto per-topic ``maxOffsetsPerTrigger`` values. Topics sharing
        the default can ride one Kafka source; topics with a specific
        cap get their own source (Spark's limit is per-source).
        """
        config = get_config()
        default = config.consumer.max_messages_per_topic
        specific = config.consumer.max_messages_per_specific_topic
        out: dict[str, Optional[int]] = {}
        for topic in self.topics():
            cap = specific.get(topic, default)
            out[topic] = None if cap == "unlimited" else int(cap)
        return out

    def start(
        self,
        spark: Optional[SparkSession] = None,
        source_df: Optional[DataFrame] = None,
        schema: Optional[Union[StructType, str]] = None,
        max_offsets_per_trigger: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
    ) -> list:
        """Start consuming (reference ``legacy-consumer.ts:126-203``).

        Validation parity: missing/blank ``group_id`` and an empty route
        table raise before anything connects. ``only_testing`` resolves
        immediately (routes are exercised via :meth:`input`).

        ``source_df`` injects any streaming DataFrame with columns
        ``(topic, value)`` (e.g. a file/memory stream in tests); when
        absent, a Kafka source subscribing to the distinct routed topics
        is built (A1). ``schema`` parses the JSON value; corrupt rows are
        dropped (A3). Imperative callbacks run inside ``foreachBatch``;
        strategy ``'one-by-one'`` iterates rows sorted by
        ``(partition, offset)`` for total order (A15), ``'topic'`` bounds
        in-flight work via ``max_offsets_per_trigger`` (A14 analog).
        """
        config = get_config()
        if not config.consumer.group_id or not config.consumer.group_id.strip():
            raise ValueError("Missing configuration config.consumer.groupId for consumer")
        if not self.routes:
            raise ValueError("Missing routes, please add minimum 1 route")
        if config.only_testing:
            return []

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("ConsumerRouter.start requires a SparkSession")

        if source_df is None:
            reader = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", config.host)
                .option("subscribe", ",".join(self.topics()))
                .option("kafka.group.id", config.consumer.group_id)
                .option("startingOffsets", "latest")
            )
            limit = max_offsets_per_trigger
            if limit is None and config.consumer.max_messages_per_topic != "unlimited":
                # A14 analog: bound in-flight records per micro-batch.
                limit = int(config.consumer.max_messages_per_topic) * max(
                    1, len(self.topics())
                )
            if limit is not None:
                reader = reader.option("maxOffsetsPerTrigger", str(limit))
            source_df = reader.load()

        cols = set(source_df.columns)
        ordered = source_df
        if {"partition", "offset"} <= cols:
            select_cols = [
                F.col("topic"),
                F.col("value").cast("string").alias("value"),
                F.col("partition"),
                F.col("offset"),
            ]
        else:
            select_cols = [F.col("topic"), F.col("value").cast("string").alias("value")]
        ordered = source_df.select(*select_cols)

        strategy = config.consumer.strategy
        router = self

        def process_batch(batch_df: DataFrame, batch_id: int) -> None:
            rows = batch_df.collect()
            if strategy == "one-by-one" and {"partition", "offset"} <= set(
                batch_df.columns
            ):
                rows = sorted(rows, key=lambda r: (r["partition"], r["offset"]))
            for row in rows:
                content = get_parsed_json(row["value"])
                router.dispatch_message(row["topic"], content)

        writer = ordered.writeStream.foreachBatch(process_batch)
        if checkpoint_dir or config.checkpoint_root:
            writer = writer.option(
                "checkpointLocation", checkpoint_dir or config.checkpoint_root
            )
        query = writer.start()
        self._queries.append(query)
        return self._queries

    def stop(self) -> None:
        """Stop all streaming queries (reference ``legacy-consumer.ts:83-87``)."""
        for query in self._queries:
            query.stop()
        self._queries.clear()
