"""TPC-H-style multi-join flagships (SURVEY.md §2.B B5/B11 depth).

Classic decision-support shapes over the testdata schema (which carries
a subset of the TPC-H columns — filters are adapted where a column is
absent, e.g. Q3 returns ``o_orderpriority`` since the generator has no
``o_shippriority``). Each query is a pure DataFrame declaration with
the money determinism protocol (integer cents on both engine and
oracle), so the DuckDB hash-gate is exact.

Scale notes per operator; the shared themes:

* fact-fact joins (orders ⨝ lineitem) stay shuffle hash / sort-merge on
  the join key — uniform keys, no skew at any SF;
* dimension sides (customer) are small relative to facts and AQE
  broadcast-joins them;
* every aggregation partial-aggregates map-side before its exchange;
* top-k ORDER BY + LIMIT compiles to TakeOrderedAndProject (no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


@query(
    "b35_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15'
      AND l_shipdate  > TIMESTAMP '1998-06-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def b35_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top unshipped orders by revenue.

    Scale: the segment filter prunes customer BEFORE its join (pushed to
    the scan), AQE broadcasts the filtered customer side into orders;
    orders⨝lineitem shuffles on the uniform orderkey; the final top-10
    is TakeOrderedAndProject — no global sort. Revenue sums integer
    cents×(100−disc), exact and associative, so LIMIT ties break on the
    deterministic (revenue, l_orderkey) pair identically to the oracle.
    """
    cutoff = F.lit("1998-06-15").cast("timestamp")
    cust = (
        load(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "b36_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)
             / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def b36_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): single-pass filtered aggregate.

    Scale: every predicate pushes to the parquet scan (range on shipdate
    prunes row groups via min/max stats), projection reads 3 columns,
    and the single global aggregate partial-aggregates per partition
    before a 1-row exchange. The purest scan-bound query in the suite —
    its throughput IS the table-scan throughput.
    """
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _cents("l_extendedprice") * _cents("l_discount")
    return li.agg(
        (F.sum(rev).cast("double") / 10000).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "b37_tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def b37_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): agg-derived semi-join.

    Scale: the HAVING subquery is a partial-aggregated groupBy on the
    uniform orderkey whose survivors form a small keeper set — joined
    back as a LEFT SEMI join (AQE broadcasts it when small enough), so
    the big fact table is never widened; the final per-order rollup
    reuses the same orderkey partitioning. Quantities sum as BIGINT —
    exact — and the top-100 is TakeOrderedAndProject with the
    deterministic (o_totalprice, o_orderkey) sort.
    """
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    li_big = li.join(big, "l_orderkey", "left_semi")
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        li_big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
