"""Frequency sketches (D-surface extension): heavy hitters + count-min.

The pipeline question "which tokens/URLs/users dominate this corpus"
has an exact answer (groupBy + top-k) and a sketch answer (count-min:
fixed O(d·w) memory regardless of cardinality). Here the count-min
sketch is expressed RELATIONALLY — a sketch cell is just a count per
(hash_row, bucket), so building it is one map-side-combinable groupBy
and merging shards is ordinary partial aggregation. No UDFs, no driver
state; at 100 TB the sketch table is d·w rows total.

Estimate(token) = min over rows i of cell(i, h_i(token)) — always an
overestimate, within ε·N with probability 1−δ (ε≈e/w, δ≈e^−d).
Accuracy is asserted in ``tests/test_dedup_quality.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_CMS_DEPTH = 4
_CMS_WIDTH = 512
_TOP_K = 20


def _tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
    )


def _bucket(row: int, tok_col: str = "tok") -> F.Column:
    """Hash row ``row``'s bucket for a token: crc32 over a row-salted
    key — deterministic across runs and engines."""
    return F.crc32(F.concat(F.lit(f"{row}|"), F.col(tok_col))) % _CMS_WIDTH


@query(
    "d10_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT tok, COUNT(*) AS cnt FROM tok WHERE length(tok) > 0
      GROUP BY tok)
    SELECT tok, cnt FROM c
    ORDER BY cnt DESC, tok
    LIMIT {_TOP_K}
    """,
)
def d10_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """D10: exact corpus heavy hitters — top-{20} tokens by frequency.

    Scale: explode + groupBy on the token (map-side partial combine
    collapses each task to its distinct tokens before the exchange);
    the top-k is TakeOrderedAndProject over the aggregated table with a
    deterministic (count, token) tiebreak.
    """
    counts = _tokens(spark, sf).groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(F.col("cnt").desc(), "tok").limit(_TOP_K)


def count_min_sketch(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Build the count-min table ``(row, bucket, cnt)`` — d·w cells.

    One explode by the d hash rows and one groupBy: both map-side
    combinable, output d·w = {4·512} rows regardless of input size.
    Shards built per source partition merge by summing cells (ordinary
    aggregation semantics), which is what AQE/partial-agg already do.
    """
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(i, tok_col).alias("bucket")
                    )
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell")
    )
    return rows.groupBy(
        F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cell_cnt"))


@query("d10_count_min", oracle=None)  # sketch estimates → rows-only check
def d10_count_min(spark: SparkSession, sf: str) -> DataFrame:
    """D10: count-min frequency estimates for the exact heavy hitters.

    Joins each top-{20} token's d hash cells against the sketch table
    and takes the min cell count — the CMS estimate. The sketch is d·w
    rows (broadcast-sized); the join fans each probe token out to its
    d cells only. Estimates are deterministic (crc32 hashing) and
    always ≥ the true count; the error bound is asserted in tests.
    """
    sketch = count_min_sketch(_tokens(spark, sf))
    top = d10_heavy_hitters(spark, sf).withColumnRenamed("cnt", "exact_cnt")
    probes = top.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), _bucket(i).alias("bucket"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select(
        "tok",
        "exact_cnt",
        F.col("cell.row").alias("row"),
        F.col("cell.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("cell_cnt").alias("est_cnt"),
        )
    )
