"""Output writers for large-scale pipelines.

The write side determines whether the NEXT job over the data is fast:

* ``write_partitioned`` — hive-style partition layout (e.g. by date) so
  downstream reads prune partitions at the source.
* ``write_sorted_buckets`` — bucketed + sorted table: repeated joins on
  the bucket key skip their shuffle entirely (see
  ``tests/test_scale_patterns.py::test_bucketed_join_has_no_shuffle``).
* ``compact`` — rewrite a directory of many small files into
  target-sized files (the small-files problem kills 100 TB metadata).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Partition-pruned layout. ``maxRecordsPerFile`` bounds file size
    without an extra repartition job."""
    writer = df.write.format(fmt).mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_sorted_buckets(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
) -> None:
    """Bucketed + sorted managed table: pays one shuffle now, removes the
    shuffle from every future join/aggregation on ``bucket_col``."""
    writer = df.write.bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(*(sort_cols or [bucket_col]))
    writer.mode("overwrite").saveAsTable(table)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``path`` into ~target-sized files; returns the new file
    count. Uses the actual input size (not row counts) to pick the file
    count, then one round-robin repartition."""
    df = spark.read.format(fmt).load(path)
    # local-filesystem sizing; for object stores swap in a FileSystem
    # listStatus walk — the compaction plan is identical
    size_bytes = _dir_size(path)
    n_files = max(1, round(size_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def _dir_size(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total
