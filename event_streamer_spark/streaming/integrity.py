"""D16 streaming leg: incremental primary-key-collision monitoring.

The batch ``d16_dup_keys`` (``operators/integrity.py``) is a per-key
count followed by :func:`dup_key_histogram`; per-key counts ADD across
shards, so the incremental index appends each micro-batch's
``(k, cnt)`` aggregate and merges with ``SUM`` at read before running
THE SAME roll-up. Any micro-batch split therefore reproduces the batch
collision report EXACTLY — the same merge-is-addition contract,
idempotent-write machinery (dynamic partition overwrite per
``batch_id``), and replay-equality test harness as the count-min / HLL
/ DDSketch / PSI-drift indexes.

This is how a 100 TB ingest watches for replay double-writes as they
happen: per-batch work is one map-combinable aggregate over the
arriving shard, state is one row per distinct key touched per batch
(compactable offline with the shared ``compact_state``), and the
read-side verdict costs one SUM-merge shuffle on the key — no scan of
historical data ever re-runs. A cross-batch duplicate (the replay
case) is invisible to any single batch's audit but exact here.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)


def dup_key_counts_batch(
    state_dir: str, key_col: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's per-key counts
    for ``key_col`` (one row per distinct key in the batch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        counts = batch_df.groupBy(
            F.col(key_col).alias("k")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        _write_batch_partition(counts, batch_id, state_dir)

    return process


def read_dup_key_audit(spark, state_dir: str, key_name: str) -> DataFrame:
    """The current collision report: SUM-merge the per-batch key count
    shards and run the batch operator's own :func:`dup_key_histogram`
    — equal to ``d16_dup_keys``'s row for this key over the union of
    all ingested batches."""
    from event_streamer_spark.operators.integrity import dup_key_histogram

    per_key = (
        spark.read.parquet(state_dir)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return dup_key_histogram(per_key, key_name)
