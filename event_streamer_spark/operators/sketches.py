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


_HLL_P = 10  # 2^10 = 1024 registers → σ ≈ 1.04/√1024 ≈ 3.3%
_HLL_M = 1 << _HLL_P


def hll_registers(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """HyperLogLog register table ``(bucket, max_rho)`` — m rows.

    Like the count-min table, HLL is relational: bucket = low p bits of
    the hash, rho = leading-zero rank of the remaining bits, and the
    register is ``max(rho)`` per bucket — one map-side-combinable
    groupBy. Merging shards = max per bucket, ordinary aggregation.
    """
    h = F.crc32(F.col(tok_col).cast("string"))
    bucket = (h % _HLL_M).alias("bucket")
    w = (h / _HLL_M).cast("long")  # remaining 32-p bits
    nbits = 32 - _HLL_P
    rho = (
        F.when(w == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits) - F.floor(F.log2(w)))
        .cast("int")
        .alias("rho")
    )
    return (
        tokens.select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


@query("d11_hll_distinct", oracle=None)  # estimator → rows-only check
def d11_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """D11: HyperLogLog distinct-token estimate built FROM SCRATCH as a
    relational plan (register table + harmonic-mean fold), alongside
    Spark's built-in ``approx_count_distinct`` (B13) for comparison.

    The raw estimate applies the standard small-range correction
    (linear counting when E ≤ 2.5m and empty registers exist). The
    whole sketch is m = {1024} rows; accuracy vs the exact distinct
    count is asserted in tests (±5%). At 100 TB: one narrow map + a
    1024-row aggregation — cardinality estimation at scan throughput.
    """
    regs = hll_registers(_tokens(spark, sf))
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    ).select(
        # empty registers contribute 2^0 = 1 each to the harmonic sum
        (F.col("present_sum") + (_HLL_M - F.col("n_present"))).alias("hsum"),
        (F.lit(_HLL_M) - F.col("n_present")).alias("zeros"),
    )
    raw = F.lit(alpha * _HLL_M * _HLL_M) / F.col("hsum")
    corrected = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("zeros") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(
        F.round(raw, 2).alias("raw_estimate"),
        F.round(corrected, 2).alias("estimate"),
        F.col("zeros").cast("bigint").alias("empty_registers"),
    )


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
