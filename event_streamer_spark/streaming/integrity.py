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


# The FK monitor's key type. Explicit read schemas are mandatory: a
# batch with zero parent (or zero unmatched-child) rows writes a
# DATALESS batch_id partition, and schema inference on such a
# directory throws UNABLE_TO_INFER_SCHEMA — so a healthy stream (no
# orphans) or a child-first prefix (the exact late-parent case the
# monitor advertises healing for) would crash exactly when working as
# designed (review r8 #3).
_FK_KEY_TYPE = "bigint"


def _read_parents(spark, state_root: str, key_type: str) -> DataFrame:
    return spark.read.schema(f"pk {key_type}").parquet(
        f"{state_root}/parents"
    )


def fk_monitor_batch(
    state_root: str,
    pk_col: str,
    fk_col: str,
    kind_col: str = "kind",
    key_type: str = _FK_KEY_TYPE,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body for a streaming referential-integrity
    monitor over ONE mixed stream of parent and child rows (tagged by
    ``kind_col`` = 'parent' | 'child').

    Per batch: (1) append this batch's parent keys to the key index;
    (2) anti-join the batch's child FKs against the index INCLUDING
    step 1's keys, and append only the still-unmatched ``(fk, cnt)``
    counts to the pending set. Under append-only parents a matched
    child can never become an orphan again, so pruning at write time
    is safe — and a parent arriving LATER than its children is healed
    at read time, where the pending set anti-joins the then-current
    index (:func:`read_fk_orphans`). Healed keys stay in the pending
    shards until :func:`prune_healed` folds them out, so between
    prunes the state is bounded by every child that EVER arrived
    before its parent (plus true orphans) — run the prune on the same
    maintenance cadence as ``compact_state``.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _migrate_legacy_state(spark, f"{state_root}/parents")
        _migrate_legacy_state(spark, f"{state_root}/pending")
        parents = (
            batch_df.filter(F.col(kind_col) == "parent")
            .select(F.col(pk_col).alias("pk"))
            .distinct()
        )
        _write_batch_partition(parents, batch_id, f"{state_root}/parents")
        children = (
            batch_df.filter(F.col(kind_col) == "child")
            .select(F.col(fk_col).alias("fk"))
        )
        known = _read_parents(spark, state_root, key_type)
        unmatched = (
            children.join(known, children.fk == known.pk, "left_anti")
            .groupBy("fk")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_batch_partition(unmatched, batch_id, f"{state_root}/pending")

    return process


def read_fk_orphans(
    spark, state_root: str, edge: str, key_type: str = _FK_KEY_TYPE
) -> DataFrame:
    """The current orphan report: SUM-merge the pending shards, drop
    every key a (possibly later-arriving) parent has since covered,
    and roll up — NULL FKs reported separately, mirroring the batch
    ``d16_fk_orphans`` row shape for one edge. Explicit schemas make
    the report well-defined before the first batch and on a fully
    healthy stream (dataless shard dirs; see ``_FK_KEY_TYPE``); an
    entirely absent state root reads as the all-zero report, so a
    dashboard polling a not-yet-started monitor sees health, not a
    crash."""
    from event_streamer_spark.helpers import hadoop_path_exists

    if not hadoop_path_exists(spark, f"{state_root}/pending"):
        return spark.createDataFrame(
            [(edge, 0, 0)], "edge string, n_orphans bigint, n_null_fk bigint"
        )
    pending = (
        spark.read.schema(f"fk {key_type}, cnt bigint")
        .parquet(f"{state_root}/pending")
        .groupBy("fk")
        .agg(F.sum("cnt").alias("cnt"))
    )
    known = _read_parents(spark, state_root, key_type)
    pending = pending.join(known, pending.fk == known.pk, "left_anti")
    return pending.agg(
        F.lit(edge).alias("edge"),
        F.coalesce(
            F.sum(F.when(F.col("fk").isNotNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_orphans"),
        F.coalesce(
            F.sum(F.when(F.col("fk").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_null_fk"),
    )


def prune_healed(
    spark, state_root: str, key_type: str = _FK_KEY_TYPE
) -> int:
    """Offline maintenance (stream stopped, same contract as
    ``compact_state``): fold the pending shards into one
    ``batch_id=-1`` partition with every parent-covered key removed,
    restoring the bounded-by-true-orphans state claim. Returns the
    number of pending key rows remaining. Uses a staged write + swap;
    refuses to run over an unfinished compaction marker."""
    from event_streamer_spark.helpers import hadoop_path_exists

    pending_dir = f"{state_root}/pending"
    if hadoop_path_exists(spark, f"{pending_dir}/_COMPACT_PENDING"):
        raise RuntimeError(
            f"{pending_dir} has an unfinished compaction marker; "
            "resolve it before pruning"
        )
    merged = (
        spark.read.schema(f"fk {key_type}, cnt bigint")
        .parquet(pending_dir)
        .groupBy("fk")
        .agg(F.sum("cnt").alias("cnt"))
    )
    known = _read_parents(spark, state_root, key_type)
    survivors = merged.join(known, merged.fk == known.pk, "left_anti")
    tmp = f"{pending_dir}__prune_tmp"
    survivors.withColumn("batch_id", F.lit(-1)).write.mode(
        "overwrite"
    ).partitionBy("batch_id").parquet(tmp)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(pending_dir).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    fs.delete(jvm.org.apache.hadoop.fs.Path(pending_dir), True)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(pending_dir),
    )
    return (
        spark.read.schema(f"fk {key_type}, cnt bigint")
        .parquet(pending_dir)
        .count()
    )
