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
