"""D14 streaming leg: incremental distribution-drift monitoring.

The batch ``d14_column_drift`` (``operators/validation.py``) is
``psi_bin_counts`` → ``psi_from_counts``; histogram counts ADD across
shards, so the incremental index appends each micro-batch's bin counts
(≤ ``_PSI_BINS`` rows per batch — state is bins × batches, compactable
offline like every index in this family) and merges with ``SUM`` at
read. Any micro-batch split therefore reproduces the batch PSI table
EXACTLY — the same merge-is-addition contract, idempotent-write
machinery, and replay-equality test harness as the count-min / HLL /
DDSketch indexes (``streaming/dedup.py``).

This is the shape a 100 TB training-data pipeline monitors ingest with:
the per-batch work is one tiny aggregate over the arriving shard, the
read-side PSI costs O(bins), and no scan of historical data ever
re-runs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)


def drift_bins_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's PSI bin counts
    (``psi_bin_counts`` — THE batch operator's own binning, so the
    incremental histogram can never drift from the batch definition)."""
    from event_streamer_spark.operators.validation import psi_bin_counts

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(psi_bin_counts(batch_df), batch_id, state_dir)

    return process


def read_psi_drift(spark, state_dir: str) -> DataFrame:
    """The current PSI term table: merge bin-count shards (SUM per bin)
    and run the batch operator's own ``psi_from_counts`` — equal to
    ``d14_column_drift`` over the union of all ingested batches."""
    from event_streamer_spark.operators.validation import psi_from_counts

    counts = (
        spark.read.parquet(state_dir)
        .groupBy("bin")
        .agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
        )
    )
    return psi_from_counts(spark, counts)


def census_batch(
    state_dir: str, columns: list
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's categorical
    value counts for ``columns`` (``census_value_counts`` — THE batch
    census's own counting, so the incremental profile can never drift
    from the batch definition). Counts add across shards; NULL values
    ride as their own (col, NULL) group, so the null tally merges the
    same way."""
    from event_streamer_spark.operators.validation import (
        census_value_counts,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(
            census_value_counts(batch_df, columns), batch_id, state_dir
        )

    return process


def read_census(spark, state_dir: str) -> DataFrame:
    """The live categorical profile: merge value-count shards (SUM per
    (col, val)) and run the batch operator's own
    ``census_from_counts`` — equal to the batch census over the union
    of all ingested batches. Empty/absent state reads as zero rows
    (explicit schema, the read_fk_orphans convention)."""
    from event_streamer_spark.helpers import hadoop_path_exists
    from event_streamer_spark.operators.validation import (
        census_from_counts,
    )

    schema = "col string, val string, c bigint, batch_id int"
    if not hadoop_path_exists(spark, state_dir):
        return census_from_counts(
            spark.createDataFrame([], schema).select("col", "val", "c")
        )
    counts = (
        spark.read.schema(schema)
        .parquet(state_dir)
        .groupBy("col", "val")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return census_from_counts(counts)
