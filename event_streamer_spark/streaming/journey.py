"""B60 streaming leg: incremental first-/last-touch attribution.

The batch ``b60_attribution`` (``operators/journey.py``) reduces each
user to (earliest event, latest event, purchase revenue). All three
statistics merge associatively — earliest = MIN over the
``(ts, event_id, event_type)`` struct (struct comparison is
lexicographic, and ``(ts, event_id)`` is the exact window order the
batch operator ranks by, with ``event_id`` unique), latest = MAX,
revenue = SUM — so the index appends one per-user shard per
micro-batch and folds shards at read with the same MIN/MAX/SUM. Any
micro-batch split therefore reproduces the batch attribution table
EXACTLY, including the FULL-join semantics for users whose every
event lacks a timestamp (their shards carry a NULL touch struct and a
real revenue sum; MIN/MAX skip NULLs, the arc lands on (NULL, NULL)).

Same idempotent ``batch_id`` partition writes, offline compaction, and
replay-equality harness as the rest of the index family. State is one
row per (user, batch) — compactable to one row per user.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)


def _touch_struct() -> F.Column:
    return F.struct("ts", "event_id", "event_type")


def attribution_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's per-user
    attribution shard — earliest/latest orderable event (NULL-ts rows
    excluded, exactly the batch operator's ordering frame) and the
    batch's purchase revenue in integer cents (NULL-ts purchases DO
    count here, matching the batch revenue scan)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        touches = (
            batch_df.filter(F.col("ts").isNotNull())
            .groupBy("user_id")
            .agg(
                F.min(_touch_struct()).alias("first_c"),
                F.max(_touch_struct()).alias("last_c"),
            )
        )
        rev = (
            batch_df.filter(
                (F.col("event_type") == "purchase")
                & F.col("value").isNotNull()
            )
            .groupBy("user_id")
            .agg(
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "revenue_cents"
                )
            )
        )
        shard = touches.join(rev, "user_id", "full")
        _write_batch_partition(shard, batch_id, state_dir)

    return process


def read_attribution(spark, state_dir: str) -> DataFrame:
    """The current attribution table: fold the per-user shards with
    MIN/MAX/SUM, then roll up to the (first_touch, last_touch) arcs —
    equal to ``b60_attribution`` over the union of all ingested
    batches."""
    per_user = (
        spark.read.parquet(state_dir)
        .groupBy("user_id")
        .agg(
            F.min("first_c").alias("first_c"),
            F.max("last_c").alias("last_c"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )
    return (
        per_user.select(
            F.col("first_c.event_type").alias("first_touch"),
            F.col("last_c.event_type").alias("last_touch"),
            "revenue_cents",
        )
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.coalesce(
                F.sum(F.coalesce(F.col("revenue_cents"), F.lit(0))),
                F.lit(0),
            ).alias("revenue_cents"),
        )
    )
