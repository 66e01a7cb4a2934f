"""Output writers for large-scale pipelines.

The write side determines whether the NEXT job over the data is fast:

* ``write_partitioned`` — hive-style partition layout (e.g. by date) so
  downstream reads prune partitions at the source.
* ``write_sorted_buckets`` — bucketed + sorted table: repeated joins on
  the bucket key skip their shuffle entirely (see
  ``tests/test_scale_patterns.py::test_bucketed_join_has_no_shuffle``).
* ``compact`` — rewrite a directory of many small files into
  target-sized files (the small-files problem kills 100 TB metadata).
* ``merge_upsert`` — keyed MERGE into a hive-partitioned directory
  without a table format: only the partitions the updates touch are
  rewritten (dynamic partition overwrite).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str],
    order_col: Optional[str] = None,
    fmt: str = "parquet",
) -> dict:
    """Keyed MERGE (upsert) into a hive-partitioned directory — the CDC
    compaction pattern without Delta/Iceberg.

    Plan, at any scale:

    1. The distinct ``partition_cols`` tuples of ``updates`` are
       collected — bounded by the touched-partition COUNT, never by row
       count (an update batch touching every partition of a 100 TB
       table is a full rewrite no matter the engine).
    2. Only those partitions are read back from the target (the filter
       is on partition columns, so the scan prunes at planning time).
    3. Surviving target rows (``LEFT ANTI`` on ``key_cols``) union the
       updates; when ``order_col`` is given, duplicate keys inside
       ``updates`` resolve to the highest ``order_col`` first
       (latest-wins, the B45 compaction rule).
    4. The combined rows are written with **dynamic partition
       overwrite**: untouched partitions keep their files byte-for-byte
       (asserted in ``tests/test_writers.py``), so readers of other
       partitions never see a partial state.

    **Precondition — stable partition values per key.** Only the
    partitions the updates touch are scanned, so a key whose
    ``partition_cols`` value CHANGES in an update leaves its old row in
    the old partition (the table then holds the key twice). Partition
    by attributes that are immutable for a given key (creation date,
    tenant, shard), as every pruned-merge layout requires; keys that
    genuinely move partitions need a delete in the old partition first.

    Returns ``{"touched_partitions": n}``.
    """
    from event_streamer_spark.helpers import hadoop_path_exists

    key_cols = list(key_cols)
    partition_cols = list(partition_cols)
    if not partition_cols:
        # with no partition columns, "the touched partitions" would be
        # the whole table — a full rewrite; require an explicit layout
        # rather than silently doing one (and the pred-building below
        # would otherwise keep NO target rows)
        raise ValueError(
            "merge_upsert requires at least one partition column; for an "
            "unpartitioned full-table upsert, anti-join + unionByName + "
            "overwrite explicitly"
        )
    if order_col is not None:
        # latest-per-key within the update batch itself: one map-side
        # combinable struct-MAX per key (order_col leads the comparison,
        # the full row rides along) — no window, no per-key sort
        updates = (
            updates.groupBy(*key_cols)
            .agg(
                F.max(
                    F.struct(F.col(order_col).alias("__ord"),
                             F.struct("*").alias("__row"))
                ).alias("__m")
            )
            .select("__m.__row.*")
        )

    # Hadoop FS existence check, NOT os.path: on s3a://... or hdfs://...
    # a driver-local check would report "missing" and the keep step would
    # silently drop every surviving target row
    target_exists = hadoop_path_exists(spark, path)
    touched = [
        tuple(r[c] for c in partition_cols)
        for r in updates.select(*partition_cols).distinct().collect()
    ]
    if target_exists:
        try:
            target = spark.read.format(fmt).load(path)
        except Exception as e:  # noqa: BLE001 — empty dir == no target yet
            if "infer schema" in str(e).lower():
                target_exists = False
            else:
                raise
    if target_exists:
        if set(target.columns) != set(updates.columns):
            raise ValueError(
                "merge_upsert: updates schema must match target — "
                f"target has {sorted(target.columns)}, "
                f"updates have {sorted(updates.columns)}"
            )
        pred = None
        for values in touched:
            clause = None
            for col, val in zip(partition_cols, values):
                # null-safe: a null partition value must still match its
                # own partition (hive's __HIVE_DEFAULT_PARTITION__)
                c = F.col(col).eqNullSafe(F.lit(val))
                clause = c if clause is None else (clause & c)
            pred = clause if pred is None else (pred | clause)
        kept = (
            target.filter(pred).join(updates, key_cols, "left_anti")
            if pred is not None
            else target.limit(0)
        )
        combined = kept.select(updates.columns).unionByName(updates)
    else:
        combined = updates

    (
        combined.write.format(fmt)
        .mode("overwrite")
        # per-write option, NOT the session conf: concurrent writers in
        # the same session must not inherit dynamic semantics
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .save(path)
    )
    return {"touched_partitions": len(touched)}


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int = 16,
    bits: int = 12,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write: co-locate rows that are close in EVERY
    ``zorder_cols`` dimension so parquet min/max footer stats skip files
    for MULTI-dimensional predicates (the Delta/Iceberg OPTIMIZE ZORDER
    layout, built from plain DataFrame ops).

    A sort by ``(a, b)`` clusters ``a`` perfectly and ``b`` not at all —
    every file spans b's whole range, so a predicate on ``b`` alone (or
    a box on ``a AND b``) reads everything. Interleaving the bits of the
    per-column bucket indices into one Morton key gives every file a
    narrow min/max range in ALL dimensions at once (asserted on real
    footers in ``tests/test_writers.py``).

    Plan, at any scale: one 1-row min/max aggregate (broadcast back —
    scalar-subquery shape), a narrow JVM bit-interleave expression, one
    ``repartitionByRange`` on the key (sampled range exchange — the
    TeraSort shuffle) + in-partition sort, then the write. No driver
    data, no UDFs.

    Bucketing is equi-WIDTH (``width_bucket`` over min..max): O(1) per
    row. Heavily skewed columns cluster better after a variance-
    stabilizing transform (e.g. log) — pass the transformed column.
    """
    zorder_cols = list(zorder_cols)
    if not 1 <= len(zorder_cols) <= 4:
        raise ValueError("zorder_write takes 1-4 cluster columns")
    if bits * len(zorder_cols) > 62:
        raise ValueError("bits * len(zorder_cols) must fit in a long")
    from pyspark.sql.types import DateType, NumericType, TimestampType

    for c in zorder_cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, (NumericType, DateType, TimestampType)):
            # a string column would min/max-cast to null bounds and
            # silently collapse the whole dimension into bucket 0
            raise ValueError(
                f"zorder_write cluster column {c!r} is "
                f"{dt.simpleString()}; cluster columns must be numeric/"
                "date/timestamp — hash or dictionary-encode strings first"
            )
    n_buckets = 1 << bits
    bounds = df.agg(
        *[
            agg(c).cast("double").alias(f"__{kind}_{c}")
            for c in zorder_cols
            for kind, agg in (("lo", F.min), ("hi", F.max))
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ncols = len(zorder_cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(zorder_cols):
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        # width_bucket yields 0..n+1 incl. out-of-range sentinels; clamp
        # to 0..n-1 (degenerate lo == hi collapses to bucket 0)
        idx = F.when(
            F.col(c).isNull(), F.lit(0)  # nulls cluster into bucket 0
        ).when(hi > lo,
            F.least(
                F.greatest(
                    F.width_bucket(F.col(c).cast("double"), lo, hi, n_buckets)
                    - 1,
                    F.lit(0),
                ),
                F.lit(n_buckets - 1),
            ),
        ).otherwise(F.lit(0)).cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(idx, b).bitwiseAND(F.lit(1)), b * ncols + i
                )
            )
    clustered = (
        with_bounds.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__{k}_{c}" for c in zorder_cols for k in ("lo", "hi")])
    )
    clustered.write.format(fmt).mode(mode).save(path)


def file_column_ranges(path: str, cols: Sequence[str]) -> list:
    """Per-file [min, max] ranges for ``cols`` from parquet FOOTERS —
    the manifest a table format (Delta/Iceberg) would keep, recovered
    from the files themselves. Metadata-only: reads footers, never row
    data; output is file-count-sized (model state).

    Local-filesystem walk; for object stores swap in a FileSystem
    listing — the pruning logic below is unchanged.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(path.rstrip("/") + "/*.parquet")):
        md = pq.read_metadata(f)
        lo: dict = {c: None for c in cols}
        hi: dict = {c: None for c in cols}
        ok = True
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            seen = set()
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in lo:
                    seen.add(name)
                    s = col.statistics
                    if s is None or not s.has_min_max:
                        ok = False
                        break
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            if not ok or seen != set(cols):
                ok = False
                break
        # zero-row-group files (Spark writes one to preserve schema on
        # empty frames) have no stats either — same conservative keep
        if any(lo[c] is None for c in cols):
            ok = False
        # a file with no usable stats must be READ, not skipped
        out.append((f, lo if ok else None, hi if ok else None))
    return out


def read_pruned(
    spark: SparkSession,
    path: str,
    ranges: dict,
    fmt: str = "parquet",
) -> DataFrame:
    """Manifest-style file skipping without a table format: drop every
    file whose footer [min, max] cannot intersect ``ranges`` (a dict
    ``{col: (lo, hi)}``; either bound may be None for open intervals),
    then hand Spark ONLY the surviving files.

    Paired with :func:`zorder_write` this recovers the table-format
    data-skipping story: the z-ordered layout makes per-file ranges
    narrow in every clustered dimension, and this reader turns those
    narrow ranges into files never opened — at 100 TB the difference
    between listing 10^6 files and scanning them. The predicate must
    ALSO be applied to the returned frame (footer pruning is a
    superset filter, exactly like partition pruning); files lacking
    stats are conservatively kept.
    """
    cols = list(ranges)
    stats = file_column_ranges(path, cols)
    keep = []
    for f, lo, hi in stats:
        if lo is None:
            keep.append(f)  # no stats → cannot prove exclusion
            continue
        hit = True
        for c, (want_lo, want_hi) in ranges.items():
            if want_lo is not None and hi[c] < want_lo:
                hit = False
                break
            if want_hi is not None and lo[c] > want_hi:
                hit = False
                break
        if hit:
            keep.append(f)
    if not keep:
        # preserve schema for the empty result
        return spark.read.format(fmt).load(path).limit(0)
    return spark.read.format(fmt).load(keep)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keyed CDC diff between two snapshot frames: one row per changed
    key with ``change_type`` ∈ {'insert', 'delete', 'update'} — the
    companion read to :func:`merge_upsert`'s write (what changed
    between yesterday's drop and today's?).

    Shape, at any scale: each side is reduced to
    ``(key…, row_hash)`` — the hash (``xxhash64`` over, per compared
    column, an is-null flag plus the string-cast value, so a genuine
    NULL can never collide with any string payload, sentinel-looking
    or otherwise) travels through the shuffle instead of the row width
    — then ONE full outer join on the key partitions both snapshots
    the same way. Unchanged keys (both sides present, hashes equal)
    are filtered BEFORE any wide-row materialization; callers join the
    keys back to whichever side they need details from. An EMPTY
    compare set is the existence-only diff: present-in-both is
    unchanged, and only inserts/deletes emerge. Assumes unique keys
    per snapshot (duplicate keys make the diff ill-defined — run the
    D16 dup-key audit first).
    """
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in key_cols]
    )
    def hashed(df: DataFrame, side: str) -> DataFrame:
        cols = [
            f
            for c in compare
            for f in (
                F.col(c).isNull(),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            )
        ]
        h = F.xxhash64(*cols) if cols else F.lit(0)
        return df.select(
            *[F.col(k) for k in key_cols],
            h.alias(f"{side}_hash"),
        )

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, list(key_cols), "full")
    return joined.filter(
        F.col("old_hash").isNull()
        | F.col("new_hash").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    ).select(
        *key_cols,
        F.when(F.col("old_hash").isNull(), F.lit("insert"))
        .when(F.col("new_hash").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    )
