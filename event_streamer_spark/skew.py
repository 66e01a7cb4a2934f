"""Skew mitigation utilities for 100 TB joins/aggregations.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in ``session.get_spark``) handles most skew at runtime. These
helpers cover the cases AQE can't:

* ``salted_join`` — explicit key salting for a hot-key inner join where
  the build side must be replicated per salt (AQE can split a skewed
  sort-merge partition, but cannot fix a hash-partitioned aggregation
  feeding it).
* ``salted_count`` — two-phase aggregation for heavily skewed group
  keys: count per (key, salt), then re-aggregate per key. Turns one
  hot reducer into ``salt_factor`` parallel ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the (large, skewed) left side, replicate
    the right side once per salt value, join on (key, salt).

    Result is row-identical to ``left.join(right, key, how)`` for inner
    joins. Shuffle volume: left unchanged, right × salt_factor — the
    standard trade for eliminating a hot partition.
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, salt_factor: int = 16
) -> DataFrame:
    """Two-phase skew-safe count per key: (key, salt) partial counts,
    then a tiny second aggregation on key alone."""
    return (
        df.withColumn("__salt", (F.rand(seed=42) * salt_factor).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
