"""Distributed ranking windows — two-level decomposition (SURVEY §2.B B15).

A plain ``Window.partitionBy(p).orderBy(o)`` ranking sorts EVERY row of a
partition key on ONE task. With low-cardinality partition keys (e.g.
``l_returnflag``: 3 values) that is a straggler at 100 TB — each of 3
tasks sorts n/3 rows. The fix is the classic two-level (TeraSort-style)
decomposition, same shape as ``pipeline.d9_sequence_pack``:

1. **Range-bucket** rows by the leading sort value using per-partition
   approximate quantile boundaries (a tiny aggregate, broadcast back).
   Bucketing is order-aligned (every row of bucket i sorts before
   bucket i+1) and tie-consistent (equal leading values share a bucket:
   strict ``>`` against each boundary).
2. **Local rank** within ``(partition, bucket)`` — parallel across
   ``|p| × n_buckets`` tasks instead of ``|p|``.
3. **Bucket offsets**: per-(partition, bucket) counts form a tiny table;
   its in-partition cumulative sum is each bucket's global base offset,
   broadcast-joined back. ``global row_number = base + local``.

Every heavy stage shuffles on the composite ``(partition, bucket)`` key;
the only ordered windows over a whole partition run on the counts table
(``n_buckets`` rows per key — model-state-sized).

With a UNIQUE total ordering, ``row_number == rank`` and the classic
rank family is arithmetic on it: ``percent_rank = (rn-1)/(n-1)``,
``cume_dist = rn/n``, and ``ntile`` follows the standard first-``r``-
buckets-get-one-extra rule. Tied rankings (``rank``/``dense_rank`` over
a low-cardinality value) go through :func:`tied_ranks` instead: a
per-(partition, value) count aggregate (map-side combinable) whose tiny
result carries the window, broadcast-joined back.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEFAULT_BUCKETS = 64


def _bucket_assign(value: Column, bounds: Column) -> Column:
    """Order-aligned bucket id: #boundaries strictly below ``value``.

    Strict ``>`` keeps ties together — rows with equal leading sort
    values always land in the same bucket, so in-bucket ordering by the
    full sort key reproduces the global order exactly.
    """
    return F.aggregate(
        bounds,
        F.lit(0),
        lambda acc, b: acc + F.when(value > b, 1).otherwise(0),
    )


def two_level_row_number(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Union[str, Column]],
    bucket_value: Union[str, Column],
    n_buckets: int = _DEFAULT_BUCKETS,
    out_col: str = "rn",
    count_col: Optional[str] = None,
) -> DataFrame:
    """Global per-partition ``row_number`` without a per-partition sort.

    ``order_cols`` must be a UNIQUE total ordering within each partition
    key; ``bucket_value`` is a numeric column ASCENDING-aligned with the
    leading sort order (negate it for a DESC leading key). Adds
    ``out_col`` (the 1-based global row number) and, when ``count_col``
    is given, the partition's total row count (for percent_rank /
    cume_dist / ntile arithmetic). Helper columns are dropped.
    """
    part_cols = list(part_cols)
    b = df.withColumn("__bv", F.col(bucket_value) if isinstance(bucket_value, str) else bucket_value)

    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = b.groupBy(*part_cols).agg(
        F.percentile_approx("__bv", fracs, 10_000).alias("__bounds")
    )
    b = b.join(F.broadcast(bounds), part_cols).withColumn(
        "__bucket", _bucket_assign(F.col("__bv"), F.col("__bounds"))
    )

    local_w = Window.partitionBy(*part_cols, "__bucket").orderBy(*order_cols)
    b = b.withColumn("__local_rn", F.row_number().over(local_w))

    counts = b.groupBy(*part_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    over_buckets = (
        Window.partitionBy(*part_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = counts.withColumn(
        "__base", F.sum("__cnt").over(over_buckets) - F.col("__cnt")
    )
    if count_col is not None:
        total_w = Window.partitionBy(*part_cols)
        bases = bases.withColumn(count_col, F.sum("__cnt").over(total_w))
    base_cols = part_cols + ["__bucket", "__base"] + (
        [count_col] if count_col else []
    )
    out = b.join(
        F.broadcast(bases.select(*base_cols)), part_cols + ["__bucket"]
    ).withColumn(out_col, (F.col("__base") + F.col("__local_rn")).cast("int"))
    return out.drop("__bv", "__bounds", "__bucket", "__local_rn", "__base")


def tied_ranks(
    df: DataFrame,
    part_cols: Sequence[str],
    value_col: str,
    descending: bool = False,
    rank_col: str = "rnk",
    dense_rank_col: str = "drnk",
) -> DataFrame:
    """``rank``/``dense_rank`` over a tied ordering, shuffle-light.

    For a low-cardinality ranking value the whole rank structure lives
    in the per-(partition, value) count table: ``dense_rank`` is the
    value's position among distinct values, ``rank`` is 1 + the count of
    rows ordered strictly before it. Both come from ONE map-side-
    combinable aggregate plus windows over that tiny table, broadcast-
    joined back — the fact table is never sorted.
    """
    part_cols = list(part_cols)
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    counts = df.groupBy(*part_cols, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_rows = (
        Window.partitionBy(*part_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy(*part_cols).orderBy(order)
    ranked = counts.select(
        *part_cols,
        value_col,
        (F.sum("__cnt").over(w_rows) - F.col("__cnt") + 1)
        .cast("int")
        .alias(rank_col),
        F.row_number().over(w_seq).alias(dense_rank_col),
    )
    return df.join(F.broadcast(ranked), part_cols + [value_col])


def ntile_expr(rn: Column, n: Column, k: int) -> Column:
    """Standard SQL ``NTILE(k)`` from a global row number and row count:
    the first ``n % k`` tiles get ``n // k + 1`` rows, the rest
    ``n // k`` (Spark and DuckDB agree on this rule)."""
    q = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    big = q + 1  # size of the first r tiles
    cutoff = r * big
    return (
        F.when(rn <= cutoff, F.ceil(rn / big))
        .otherwise(r + F.ceil((rn - cutoff) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
