"""Real-broker Kafka integration suite (marker ``kafka``).

The reference proves its Kafka legs against a live broker
(``/root/reference/src/consumer/__tests__/index.test.ts:86-134`` via
``docker-compose.yml``'s ``spotify/kafka``). This container has no
broker, so these tests GATE on ``EVENT_STREAMER_KAFKA_BROKER``
(bootstrap servers, e.g. ``localhost:9092``) and skip cleanly when it
is unset — the option-plumbing contract tests
(``test_kafka_options_matrix.py``) remain the in-container stand-in.

Where a broker exists, run this file in its OWN pytest process so the
Spark session can pull the Kafka connector before any other fixture
builds a JVM::

    EVENT_STREAMER_KAFKA_BROKER=localhost:9092 \
        python -m pytest -m kafka tests/test_kafka_integration.py -q

The session adds ``spark.jars.packages`` for
``spark-sql-kafka-0-10`` matched to the installed PySpark version
(downloads via Ivy on first run; needs network or a primed cache).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

import pytest

BROKER = os.environ.get("EVENT_STREAMER_KAFKA_BROKER")

pytestmark = pytest.mark.kafka

if not BROKER:
    pytest.skip(
        "no Kafka broker: set EVENT_STREAMER_KAFKA_BROKER=host:port",
        allow_module_level=True,
    )

from event_streamer_spark.config import (  # noqa: E402
    Config,
    ConsumerConfig,
    ProducerConfig,
    set_config,
)
from event_streamer_spark.consumer import ConsumerRouter  # noqa: E402
from event_streamer_spark.producer import emit  # noqa: E402

CREATED_AT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}Z$")


@pytest.fixture(scope="module")
def kafka_spark():
    import pyspark
    from pyspark.sql import SparkSession

    pkg = f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
    s = (
        SparkSession.builder.appName("kafka-integration")
        .master("local[4]")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _topic(prefix: str) -> str:
    return f"es-it-{prefix}-{uuid.uuid4().hex[:12]}"


def _read_topic(spark, topic: str):
    """Batch-read every message currently on a topic."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
        .collect()
    )


def _wait_for(predicate, timeout_s: float = 60.0, step_s: float = 0.5):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(step_s)
    return predicate()


class TestProduceRoundTrip:
    def test_envelope_bytes_and_fanout(self, kafka_spark):
        """A2/A4/A8/A11: emit a 2-element payload array → two Kafka
        messages, each a JSON envelope with UpperCamelCase code,
        resolved appName, and the reference createdAt format."""
        set_config(
            Config(
                host=BROKER,
                app_name="it-app",
                consumer=ConsumerConfig(group_id="it-group"),
            )
        )
        topic = _topic("envelope")
        emit(topic, "user-created", [{"id": 1}, {"id": 2}])

        rows = _read_topic(kafka_spark, topic)
        assert len(rows) == 2
        envs = sorted((json.loads(r["value"]) for r in rows), key=lambda e: e["id"])
        for i, env in enumerate(envs, start=1):
            assert env["id"] == i
            assert env["code"] == "UserCreated"
            assert env["appName"] == "it-app"
            assert CREATED_AT_RE.match(env["createdAt"])

    def test_gzip_and_idempotent_producer_options(self, kafka_spark):
        """A2: gzip compression + idempotence are transparent to the
        consumer — payloads read back byte-identical after broker-side
        decompression."""
        set_config(
            Config(
                host=BROKER,
                app_name="it-app",
                producer=ProducerConfig(
                    compression_type="gzip", idempotent=True
                ),
                consumer=ConsumerConfig(group_id="it-group"),
            )
        )
        topic = _topic("gzip")
        emit(topic, "compressed-event", {"blob": "x" * 2048})

        rows = _read_topic(kafka_spark, topic)
        assert len(rows) == 1
        env = json.loads(rows[0]["value"])
        assert env["blob"] == "x" * 2048
        assert env["code"] == "CompressedEvent"

    def test_multi_topic_batch_emit(self, kafka_spark):
        """A9: one emit([...]) call lands each Output on its own topic."""
        set_config(
            Config(
                host=BROKER,
                app_name="it-app",
                consumer=ConsumerConfig(group_id="it-group"),
            )
        )
        t_a, t_b = _topic("multi-a"), _topic("multi-b")
        emit(
            [
                {"topic": t_a, "data": {"k": "a"}},
                {"topic": t_b, "data": {"k": "b"}},
            ]
        )
        assert json.loads(_read_topic(kafka_spark, t_a)[0]["value"])["k"] == "a"
        assert json.loads(_read_topic(kafka_spark, t_b)[0]["value"])["k"] == "b"


class TestConsumeRoundTrip:
    def test_produce_consume_dispatch(self, kafka_spark, tmp_path):
        """A1/A3/A5: start a router against the live broker, produce
        after the stream is up (startingOffsets=latest), and assert the
        handler observed every payload."""
        group = f"it-{uuid.uuid4().hex[:8]}"
        topic = _topic("consume")
        set_config(
            Config(
                host=BROKER,
                app_name="it-app",
                consumer=ConsumerConfig(group_id=group),
            )
        )
        seen: list = []
        router = ConsumerRouter()
        router.add(topic, "PingEvent", lambda c, e: seen.append(c["n"]))
        queries = router.start(
            kafka_spark, checkpoint_dir=str(tmp_path / "ckpt")
        )
        try:
            assert len(queries) == 1
            # wait for the first (possibly empty) micro-batch so the
            # latest-offsets baseline is committed before producing
            _wait_for(lambda: queries[0].recentProgress, timeout_s=60)
            for n in range(3):
                emit(topic, "ping-event", {"n": n})
            assert _wait_for(lambda: sorted(seen) == [0, 1, 2], timeout_s=90)
        finally:
            router.stop()

    def test_per_source_group_ids_coexist(self, kafka_spark, tmp_path):
        """A14: a specific-cap topic gets its own source, consumer
        group (suffixes) and checkpoint — both queries make progress
        concurrently against the real broker without rebalance storms."""
        group = f"it-{uuid.uuid4().hex[:8]}"
        t_hot, t_cold = _topic("hot"), _topic("cold")
        set_config(
            Config(
                host=BROKER,
                app_name="it-app",
                consumer=ConsumerConfig(
                    group_id=group,
                    max_messages_per_specific_topic={t_hot: 5},
                ),
            )
        )
        seen: dict[str, list] = {t_hot: [], t_cold: []}
        router = ConsumerRouter()
        router.add(t_hot, lambda c, e: seen[t_hot].append(c["n"]))
        router.add(t_cold, lambda c, e: seen[t_cold].append(c["n"]))
        queries = router.start(
            kafka_spark, checkpoint_dir=str(tmp_path / "ckpt2")
        )
        try:
            assert len(queries) == 2  # capped source split out
            _wait_for(
                lambda: all(q.recentProgress for q in queries), timeout_s=60
            )
            for n in range(3):
                emit(t_hot, {"n": n})
                emit(t_cold, {"n": n})
            assert _wait_for(
                lambda: sorted(seen[t_hot]) == [0, 1, 2]
                and sorted(seen[t_cold]) == [0, 1, 2],
                timeout_s=90,
            )
        finally:
            router.stop()
