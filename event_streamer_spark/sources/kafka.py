"""Kafka source/sink builders (SURVEY §2.A A1/A2, §3.2).

Thin, explicit wrappers over Spark's Kafka connector. Consumer parity:

* subscribe to the distinct routed topics in one source (A1 — the
  reference's topic-level source pruning, ``legacy-consumer.ts:148,153``)
* ``max_offsets_per_trigger`` is the A14 backpressure analog: Spark's
  micro-batch admission replaces the reference's pause/resume queue.
* at-least-once by default; checkpointing + idempotent producer gives
  the C10 exactly-once upgrade.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    group_id: Optional[str] = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: Optional[int] = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Streaming Kafka source over the distinct routed topics (A1)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Batch Kafka read (bounded replay)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: Optional[str] = None,
    compression: Optional[str] = None,
    idempotent: bool = False,
    checkpoint_dir: Optional[str] = None,
    streaming: bool = False,
):
    """Kafka sink (A2). ``df`` needs a ``value`` column (and optionally
    ``topic``/``key``); per-row ``topic`` covers multi-topic emit (A9).

    ``idempotent=True`` + checkpointing = the C10 exactly-once upgrade
    over the reference's at-least-once.
    """
    writer = df.writeStream if streaming else df.write
    writer = writer.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap_servers
    )
    if topic:
        writer = writer.option("topic", topic)
    if compression:
        writer = writer.option("kafka.compression.type", compression)
    if idempotent:
        writer = writer.option("kafka.enable.idempotence", "true")
    if streaming:
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.start()
    return writer.save()
