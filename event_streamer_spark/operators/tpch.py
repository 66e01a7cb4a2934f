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
    "b38_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def b38_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted to the testdata
    schema: the generator has no ``l_commitdate``/``l_receiptdate``, so
    the "late line" EXISTS predicate becomes ``l_shipdate >
    o_orderdate`` (shipped after the order date) — same correlated
    EXISTS shape as the spec (reference has no joins; SURVEY §2.B B28).

    Scale: the quarter filter pushes to the orders scan; the correlated
    EXISTS compiles to a LEFT SEMI join on the uniform orderkey with the
    date comparison as the join residual — no row widening, no distinct
    needed; the 5-row priority rollup partial-aggregates map-side.
    """
    o = (
        load(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "b39_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 2000)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def b39_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the generator
    has no ``partsupp``, so the part-supplier pairs come from lineitem's
    ``(l_partkey, l_suppkey)``, and the excluded-supplier predicate is
    ``s_acctbal < 2000`` (no ``s_comment`` column). Exercises NOT IN
    (anti-join) + COUNT(DISTINCT) per SURVEY §2.B B12/B28.

    Scale: part's brand/size filters push to its scan and AQE
    broadcast-joins the pruned dimension; the excluded-supplier list is
    a tiny broadcast anti-join (supplier keys are NOT NULL, so NOT IN ≡
    anti-join); COUNT(DISTINCT suppkey) expands to a two-level
    aggregate on the uniform (brand, type, size, suppkey) key — partial
    map-side, no hot reducer. The final sort is a few thousand rows.
    """
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excl = (
        load(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(excl, "l_suppkey", "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "b40_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def b40_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): per-nation revenue where the
    customer and supplier share a nation inside one region, over an
    order-date year. The deepest join chain in the suite (6 tables).

    Scale: region→nation prunes to a handful of nationkeys broadcast
    down the whole chain; customer and supplier are dimensions (AQE
    broadcasts); the only fact-fact shuffle is orders⨝lineitem on the
    uniform orderkey. The co-nation predicate rides the supplier join
    as a residual. Revenue uses integer cents (exact, associative).
    """
    cutoff_lo = F.lit("1997-01-01").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01").cast("timestamp")
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf, "nation").join(
        region, F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    customer = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= cutoff_lo)
            & (F.col("o_orderdate") < cutoff_hi)
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "b41_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def b41_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by lost
    revenue on returned lines in a quarter.

    Scale: the quarter filter pushes to the orders scan, the returnflag
    filter to the lineitem scan (row-group pruning on both); nation is
    a broadcast dim; the rollup groups on the high-cardinality custkey
    (uniform, partial-agg); top-20 is TakeOrderedAndProject with a
    deterministic (revenue, custkey) tiebreak.
    """
    orders = (
        load(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "b42_tpch_q14",
    oracle="""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                   ELSE 0 END) AS DOUBLE)
           / SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
             AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def b42_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), adapted: the generator's ``p_type``
    is a plain category, so the spec's ``LIKE 'PROMO%'`` becomes
    equality with 'PROMO'.

    Scale: the ship-month filter prunes lineitem row groups; part is a
    broadcast dim keyed on the uniform partkey; the conditional revenue
    ratio is one partial-aggregated global fold. Both numerator and
    denominator stay in exact integer cents until the final division,
    so the ratio is bit-stable across partitionings.
    """
    li = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load(spark, sf, "part").select("p_partkey", "p_type")
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100) * F.sum(promo).cast("double") / F.sum(rev)).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "b43_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def b43_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: no ``p_container``, so
    each disjunct pairs a brand with size and quantity ranges.

    Scale: the OR-of-ANDs predicate spans both tables, but Catalyst
    derives the single-table implications — a brand/size disjunction
    pushes to the part scan and a quantity disjunction to the lineitem
    scan — before the broadcast hash join on the uniform partkey; the
    residual evaluates post-join. One-row integer-cents rollup.
    """
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            (F.sum(rev).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "b44_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def b44_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year.

    Scale: both nation filters prune their (25-row) dimension before
    broadcasting down the chain; supplier/customer broadcast too; the
    only fact-fact shuffle is lineitem⨝orders on the uniform orderkey.
    The symmetric nation-pair disjunction is a residual on the joined
    row. Integer-cents revenue; deterministic 3-column sort.
    """
    ship_lo = F.lit("1996-01-01").cast("timestamp")
    ship_hi = F.lit("1998-01-01").cast("timestamp")
    pair = ("NATION_3", "NATION_7")
    nations = load(spark, sf, "nation").filter(
        F.col("n_name").isin(*pair)
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") >= ship_lo) & (F.col("l_shipdate") < ship_hi))
        .select(
            "l_suppkey", "l_orderkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        )
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
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


@query(
    "b49_tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             / 700.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND p_type  = 'SMALL'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
)
def b49_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: the generator
    has no ``p_container``, so the part predicate is brand + ``p_type =
    'SMALL'``. The defining shape is the CORRELATED SCALAR-AVG subquery
    (``l_quantity < 0.2 * avg(qty) per part``) — the decorrelation
    pattern nothing else in the suite covers (spec Q17; reference has no
    subqueries, SURVEY §2.B B28).

    Spark-first decorrelation: the per-part average is an explicit
    groupBy on the uniform partkey, broadcast-joined back onto the
    filtered fact — one fact shuffle total, no per-row subquery. The
    average compares exactly on both engines: quantities are
    integer-valued doubles, so sum/count is the same IEEE division.
    Revenue sums integer cents; /700.0 (cents→dollars, /7 yearly) is a
    single deterministic double division.
    """
    p = (
        load(spark, sf, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # correlated scalar avg, decorrelated: avg(qty) per part, restricted
    # to the filtered parts, broadcast back onto the fact — the join
    # enforces the part predicate AND delivers the threshold in one hop
    avg_small = (
        li.groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("__avg_qty"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_partkey", "__avg_qty")
    )
    return (
        li.join(F.broadcast(avg_small), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            (
                F.sum(_cents("l_extendedprice")).cast("double") / 700.0
            ).alias("avg_yearly")
        )
    )


@query(
    "b50_tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def b50_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    ``l_receiptdate``/``l_commitdate`` in the generator, so a line is
    "late" when it ships >30 days after its order date (same adaptation
    family as Q4). The defining shape is the EXISTS + NOT-EXISTS pair of
    correlated self-joins on lineitem — the only multi-self-join
    decorrelation in the suite (spec Q21).

    Spark-first decorrelation (r13, tightened r14 — guide §2.2/§2.3/§3):
    both quantifiers are per-ORDER supplier-key min/max statistics —
    EXISTS(other supplier) ⟺ min≠max over the order's suppkeys,
    NOT EXISTS(other late supplier) ⟺ min=max over its LATE suppkeys —
    and r14 computes every statistic (plus the per-order late-line
    count that replaces the per-line fan-out) in ONE map-side-combinable
    aggregate riding the lineitem×orders join's own partitioning: no
    window sort, one lineitem scan, no order-grain SMJ. The nation
    filter prunes supplier to 1/25 BEFORE its broadcast join, so the
    fact flow is filtered early. Top-100 on the deterministic
    (numwait DESC, s_name) pair is TakeOrderedAndProject.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    nat = (
        load(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    orders_f = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # every F-order line, tagged with its order date (lateness computable once)
    lined = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
    # r13 reduced both correlated quantifiers to per-ORDER min/max
    # supplier-key statistics (guide §2.3/§3):
    #   EXISTS(other supplier in order)  ⟺  min≠max over the order's
    #     non-NULL suppkeys (mine is among them, so min=max ⇒ all mine);
    #   NOT EXISTS(other supplier ALSO late)  ⟺  min=max over its LATE
    #     suppkeys (my own late line is in that set).
    # r14 folds ALL of them into ONE map-side-combinable aggregate over
    # the joined frame (guide §2.2 — the r13 shape still paid a window
    # sort over the late lines plus a SECOND lineitem scan + order-grain
    # SMJ for the all-lines stats):
    #   - the all-lines min/max per F-order is identical over `lined`
    #     and over raw lineitem (the orders join preserves every line of
    #     a matched order), so the second scan is redundant;
    #   - when min=max over an order's late suppkeys, EVERY late line
    #     with a non-NULL suppkey belongs to that one supplier, so the
    #     per-line count the old window+join produced equals
    #     count(late, l_suppkey non-NULL) — late lines with NULL
    #     suppkeys never matched the supplier equi-join before, and
    #     count(CASE WHEN late THEN l_suppkey END) skips them the same
    #     way. NULL o_orderdate makes `late` NULL ⇒ skipped, exactly as
    #     the old filter dropped those lines.
    # The aggregate rides the orderkey partitioning the join already
    # established (no new exchange, no sort), and only order-grain
    # 5-column rows survive to the broadcast supplier join. Equivalence
    # proven hash-identical vs the unchanged DuckDB oracle at
    # sf0.001/0.01/0.1 + the hostile corpus (OPTIMIZATION_r14.md).
    late_key = F.when(late, F.col("l_suppkey"))
    stats = lined.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("__min_s"),
        F.max("l_suppkey").alias("__max_s"),
        F.min(late_key).alias("__min_l"),
        F.max(late_key).alias("__max_l"),
        F.count(late_key).alias("__n_late"),
    )
    qualified = stats.filter(
        (F.col("__min_l") == F.col("__max_l"))
        & (F.col("__min_s") != F.col("__max_s"))
    )
    return (
        qualified.join(
            F.broadcast(supp), F.col("__min_l") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.sum("__n_late").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "b51_tpch_q2",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    euro AS (
      SELECT o.l_partkey, o.l_suppkey, o.cost_c,
             s_acctbal, s_name, n_name
      FROM offers o
      JOIN supplier ON s_suppkey = o.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part JOIN euro ON p_partkey = euro.l_partkey
    WHERE p_size < 20 AND p_type = 'LARGE'
      AND cost_c = (SELECT MIN(e2.cost_c) FROM euro e2
                    WHERE e2.l_partkey = part.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def b51_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the generator has no
    ``partsupp``, so the part-supplier offer relation derives from
    lineitem's distinct ``(l_partkey, l_suppkey)`` pairs with supply
    cost = MIN(integer-cents extendedprice) — an exact, deterministic
    stand-in for ``ps_supplycost``. The defining shape survives: a
    correlated MIN subquery over a 4-way dimension join, decorrelated
    into a per-part MIN aggregate joined back on (partkey, cost).

    Scale: the offers aggregate shuffles once on the uniform (part,
    supp) key; the European supplier side is dimension-sized and
    broadcasts; the per-part MIN is a second small aggregate of the
    already-reduced offers; part's size/type filter prunes its scan.
    Deterministic top-100: (s_acctbal DESC, n_name, s_name, p_partkey)
    is a total order because s_name is unique per supplier row.
    """
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents("l_extendedprice")).alias("cost_c")
    )
    nat = (
        load(spark, sf, "nation")
        .join(
            F.broadcast(
                load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    euro = offers.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    best = euro.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost_c").alias("min_c")
    )
    p = (
        load(spark, sf, "part")
        .filter((F.col("p_size") < 20) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_brand")
    )
    return (
        euro.join(
            F.broadcast(best),
            (F.col("m_partkey") == F.col("l_partkey"))
            & (F.col("cost_c") == F.col("min_c")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "b52_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_8'
                               THEN vol_c ELSE 0 END) AS DOUBLE)
                 / SUM(vol_c), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol_c,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01')
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def b52_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share): the share of one supplier
    nation in a region's customer volume, by order year. Adapted only
    in constants (generator nation/type names); the 8-table join and
    conditional-aggregate share arithmetic are the spec's.

    Scale: every dimension chain (part type filter, American customers
    via nation→region, supplier nation) prunes before broadcasting; the
    only fact-fact shuffle is lineitem⨝orders on the uniform orderkey.
    Volume is integer cents×(100−disc) so both SUMs are exact BIGINTs;
    the share is one double division rounded to 6 — deterministic on
    both engines.
    """
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    region = load(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        load(spark, sf, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    cust = (
        load(spark, sf, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .withColumn("vol_c", vol)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_8", F.col("vol_c"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum("vol_c"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "b53_tpch_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                    - CAST(ROUND(p_retailprice*100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * 10) AS BIGINT)
             / 10000.0 AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def b53_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no ``partsupp``, so the
    cost leg ``ps_supplycost * l_quantity`` becomes ``10% of
    p_retailprice * l_quantity`` (the generator's only cost-like part
    attribute). The spec shape survives: 5-way join, LIKE filter on
    p_name, profit grouped by supplier nation × order year.

    Scale: the p_name LIKE filter prunes part before broadcast (a
    substring filter can't push to parquet stats but runs in the scan);
    supplier+nation broadcast; lineitem⨝orders is the one fact shuffle.
    Profit is exact BIGINT cent×percent arithmetic (retail leg scaled
    ×10 to the same 1/10000-dollar unit), divided once at the end.
    """
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = _cents("l_extendedprice") * (
        F.lit(100) - _cents("l_discount")
    ) - _cents("p_retailprice") * F.col("l_quantity").cast("bigint") * 10
    # r13 (guide §2.3 "aggregate before you shuffle"): profit cents
    # pre-aggregate to (orderkey, nation) grain BEFORE the fact-fact
    # join — the exact BIGINT sum is associative, so re-aggregating by
    # (nation, year) after the orders join is value-identical (proven
    # vs the unchanged oracle at 3 SFs + hostile corpus), while the
    # orderkey shuffle now carries ~1/5th the rows (order grain, 3
    # narrow columns) instead of full line grain.
    pre = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_orderkey", "n_name")
        .agg(F.sum(profit).alias("__prof_c"))
    )
    return (
        pre.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum("__prof_c").cast("double") / 10000).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "b54_tpch_q11",
    oracle="""
    WITH nat_value AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS val_c
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(val_c AS BIGINT) / 10000.0 AS value
    FROM nat_value
    WHERE CAST(val_c AS DOUBLE) >
          (SELECT CAST(SUM(val_c) AS DOUBLE) * 0.001 FROM nat_value)
    ORDER BY value DESC, p_partkey
    """,
)
def b54_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: no
    ``partsupp``, so a nation's "stock value" per part is the lineitem
    revenue its suppliers shipped (exact integer cents). The defining
    shape survives: an aggregate filtered by a SCALAR SUBQUERY over the
    SAME aggregate (parts holding >0.1% of the nation's total).

    Scale: the nation filter prunes supplier to 1/25 before its
    broadcast; one fact shuffle on partkey for the per-part aggregate;
    the global total re-aggregates the ALREADY-REDUCED per-part frame
    (2000 rows, not 60k facts) into a 1-row broadcast cross-join —
    the per-part frame is computed once per consumer, both map-side
    partial. Threshold compare is BIGINT→double on both engines.
    """
    nat = (
        load(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    val = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val_c"))
    )
    total = per_part.agg(
        (F.sum("val_c").cast("double") * 0.001).alias("__thresh")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_c").cast("double") > F.col("__thresh"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_c").cast("double") / 10000).alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@query(
    "b55_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def b55_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: no
    ``l_shipmode``/``l_commitdate``/``l_receiptdate`` in the generator,
    so the mode group becomes ``l_linestatus`` and "late" is the Q4/Q21
    convention (shipped >30 days after order date). The spec's defining
    shape survives: a fact-fact join whose aggregate splits counts by a
    CASE over the joined dimension attribute.

    Scale: the ship-year range pushes to the lineitem scan; the join
    shuffles both facts on the uniform orderkey; the lateness predicate
    is a join residual (needs both sides); the 2-group conditional
    aggregate partial-aggregates map-side. BIGINT counts — exact.
    """
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "b56_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def b56_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: no
    ``o_comment`` in the generator, so the excluded-order predicate is
    ``o_orderpriority <> '1-URGENT'``. The spec shape survives: LEFT
    join with the filter INSIDE the join condition (zero-order
    customers must survive with count 0), then a histogram of counts.

    Scale: the priority filter prunes orders before the join; the join
    shuffles on the uniform custkey (or broadcasts customer at small
    SF); COUNT(o_orderkey) ignores the NULLs the LEFT join produces;
    the second aggregate runs on the already-reduced 1-row-per-customer
    frame. BIGINT counts; deterministic (custdist, c_count) sort.
    """
    c = load(spark, sf, "customer").select("c_custkey")
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "b57_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_c AS BIGINT) / 10000.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_c = (SELECT MAX(total_c) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def b57_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose quarterly
    revenue equals the global maximum — the spec's view + scalar-MAX
    shape, constants adapted to the generator's date range.

    Scale: the quarter filter pushes to the scan; per-supplier revenue
    is one partial-aggregated shuffle on the uniform suppkey; the MAX
    re-aggregates the already-reduced 100-row frame into a 1-row
    broadcast; integer-cents revenue makes the MAX-equality exact (the
    float-revenue version of this query is nondeterministic by
    construction — ties on doubles; cents sidestep it).
    """
    li = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_c"))
    best = revenue.agg(F.max("total_c").alias("__max_c"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_c") == F.col("__max_c"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / 10000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "b58_tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_8'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 100)
    ORDER BY s_name
    """,
)
def b58_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no ``partsupp``
    availqty, so "has excess stock to promote" becomes "shipped more
    than 100 units of red parts in the year" — the spec's nested
    IN-subquery-with-aggregate-threshold shape survives (IN over a
    GROUP BY + HAVING derived table, itself filtered by a part
    subquery).

    Scale: the p_name prefix LIKE prunes part before broadcast; the
    ship-year range pushes to the lineitem scan; the HAVING aggregate
    partial-aggregates on the uniform suppkey into a tiny keeper set
    that LEFT SEMI joins (broadcast) against the nation-pruned
    supplier dimension. BIGINT quantity sum — exact threshold.
    """
    nat = (
        load(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_8")
        .select("n_nationkey")
    )
    s = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    keepers = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(keepers),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "b59_tpch_q22",
    oracle="""
    WITH eligible AS (
      SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
             CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
             c_custkey
      FROM customer
      WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9))
    SELECT cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) / 100.0 AS totacctbal
    FROM eligible
    WHERE CAST(bal_c AS DOUBLE) >
          (SELECT AVG(CAST(bal_c AS DOUBLE)) FROM eligible WHERE bal_c > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def b59_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: no ``c_phone`` in
    the generator, so the country code is ``c_nationkey % 10`` and the
    code list is the odd digits. The spec's defining shape survives:
    scalar-AVG threshold subquery + NOT EXISTS anti-join on orders for
    lapsed customers (no order in the trailing window — the generator's
    customers nearly all have SOME order, so the spec's never-purchased
    predicate would select zero rows; the windowed form keeps the
    anti-join non-trivial: 63 rows at sf0.01).

    Scale: the code filter prunes customer at the scan; the AVG
    threshold re-aggregates the pruned frame into a 1-row broadcast;
    NOT EXISTS is a LEFT ANTI join on the uniform custkey (orders
    projected to the single join column). Balances are integer cents:
    the AVG is an exact BIGINT sum divided once, so the threshold
    compare is the same IEEE double on both engines — a raw float AVG
    would be order-dependent and could flip boundary rows.
    """
    eligible = (
        load(spark, sf, "customer")
        .filter((F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
        .select(
            (F.col("c_nationkey") % 10).cast("bigint").alias("cntrycode"),
            _cents("c_acctbal").alias("bal_c"),
            "c_custkey",
        )
    )
    thresh = eligible.filter(F.col("bal_c") > 0).agg(
        F.avg(F.col("bal_c").cast("double")).alias("__avg_c")
    )
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal_c").cast("double") > F.col("__avg_c"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
