"""Broadcastable Bloom filters as relational plans.

The shared primitive behind the Bloom-pruned operators
(``operators/pipeline.d8_decontaminate_bloom``, ``skew.bloom_prune_join``,
``streaming/ops.stream_decontaminate_bloom``): build a bitmap over a key
column with ordinary aggregations, broadcast it as ONE ``array<long>``
row, and test membership map-side with k crc32 probes. No driver state,
no UDFs; the bitmap is model-sized (32 KiB) regardless of input
cardinality, like the count-min table (`operators/sketches.py`).

Bloom property the callers rely on: NO false negatives — every inserted
key passes ``bloom_might_contain``; false positives (~α) must be removed
by an exact verify step downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOOM_BITS = 1 << 18  # 262144 bits → 4096 longs ≈ 32 KiB broadcast
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 4  # hash probes per key


def bloom_bitmap(keys: DataFrame, col: str = "g") -> DataFrame:
    """Build a Bloom bitmap over ``keys[col]`` as a 1-row frame holding
    ``array<long>`` of m/64 words — no driver state, no UDFs.

    Relational construction: explode each key into its k crc32 bit
    positions, distinct (map-side combinable), OR the per-word masks,
    then fold the ≤m/64-row word table into a dense array via a map
    lookup over ``sequence``.
    """
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    (
                        F.crc32(F.concat(F.lit(f"bloom{i}|"), F.col(col)))
                        % _BLOOM_BITS
                    ).alias("p")
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.expr("pos DIV 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    ).select(
        F.expr(
            f"transform(sequence(0, {_BLOOM_WORDS - 1}), "
            "w -> coalesce(m[CAST(w AS BIGINT)], CAST(0 AS BIGINT)))"
        ).alias("bloom")
    )


def bloom_might_contain(col: str = "g", bitmap_col: str = "bloom") -> F.Column:
    """Membership predicate against a :func:`bloom_bitmap` column: true
    iff ALL k probe bits are set (never a false negative)."""
    conds = []
    for i in range(_BLOOM_K):
        p = f"(crc32(concat('bloom{i}|', {col})) % {_BLOOM_BITS})"
        conds.append(
            f"(element_at({bitmap_col}, CAST({p} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) <> 0"
        )
    return F.expr(" AND ".join(conds))
