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


def bloom_prune_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "left_semi",
) -> DataFrame:
    """Bloom-pruned join: reject ``large`` rows whose ``key`` cannot
    match any ``small`` key MAP-SIDE (broadcast 32 KiB bitmap, k crc32
    probes, no false negatives) before the real join verifies exactly.

    The result is IDENTICAL to ``large.join(small, key, how)`` —
    asserted in tests — but when most large-side keys don't match
    (dedup-against-index, decontamination, delta-vs-snapshot lookups),
    the shuffle moves only survivors: true matches plus the ~α
    false-positive sliver, instead of the whole fact table.

    This is Spark's own runtime-bloom-filter rewrite
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) made explicit
    and deterministic: available on any plan shape, any join type whose
    semantics survive pruning non-matching LEFT rows (semi/inner —
    not outer/anti, which must SEE the non-matching rows; rejected
    with a ValueError).

    Both sides must carry the SAME type for ``key``: the probe hashes
    the key's string form, and two types whose string forms diverge
    where the join's numeric coercion matches (bigint 1 vs double 1.0)
    would turn coercion matches into false negatives — so a type
    mismatch is rejected up front instead of silently dropping rows.
    """
    from event_streamer_spark.bloom import bloom_bitmap, bloom_might_contain

    if how not in ("left_semi", "inner"):
        raise ValueError(
            "bloom_prune_join supports left_semi/inner joins only; "
            f"{how!r} joins need the non-matching left rows"
        )
    lt = large.schema[key].dataType
    st = small.schema[key].dataType
    if lt != st:
        raise ValueError(
            f"bloom_prune_join requires matching key types; {key!r} is "
            f"{lt.simpleString()} on the large side and "
            f"{st.simpleString()} on the small side — cast one side "
            "explicitly so string canonicalization agrees with join "
            "coercion"
        )
    keys = small.select(F.col(key).cast("string").alias("__bk")).distinct()
    bitmap = bloom_bitmap(keys, "__bk")
    pruned = (
        large.withColumn("__bk", F.col(key).cast("string"))
        .crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain("__bk"))
        .drop("__bk", "bloom")
    )
    return pruned.join(small, key, how)
