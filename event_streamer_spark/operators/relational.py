"""Batch relational surface (SURVEY.md §2.B, B1-B30).

Every query is a pure DataFrame/SQL declaration — Catalyst gets full
visibility for predicate pushdown, column pruning, join selection, and
AQE re-planning. No RDDs, no driver-side loops over data.

Determinism: money arithmetic uses integer cents (``round(x*100)`` →
BIGINT) so sums/products are associative and bit-identical to the DuckDB
oracle regardless of partial-aggregation order; see ``registry`` module
docstring.

Scale notes are on each operator: which side broadcasts, where the
shuffle is, and why the plan survives 1000 executors.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load, register_views


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


def _o_cents(expr: str) -> str:
    return f"CAST(ROUND({expr}*100) AS BIGINT)"


# ---------------------------------------------------------------------
# B1 — parquet scan (projection reaches the scan: check ReadSchema)
# ---------------------------------------------------------------------

@query(
    "b01_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    """,
)
def b01_parquet_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B1: raw parquet scan + projection; column pruning must reach the scan."""
    return load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


# ---------------------------------------------------------------------
# B2 — CSV / JSON scans (round-trip derived deterministically from parquet)
# ---------------------------------------------------------------------

def _roundtrip_dir(sf: str, fmt: str) -> str:
    tag = sf.strip("/").replace("/", "_")
    return f"/tmp/es_spark_fixtures/{tag}/nation_{fmt}"


@query("b02_csv_scan", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def b02_csv_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B2: CSV source with explicit schema (header, no inference ambiguity)."""
    path = _roundtrip_dir(sf, "csv")
    nation = load(spark, sf, "nation")
    if not os.path.exists(path):
        nation.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.csv(
        path, header=True, schema="n_nationkey int, n_name string, n_regionkey int"
    ).select("n_nationkey", "n_name", "n_regionkey")


@query("b02_json_scan", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def b02_json_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B2: JSON-lines source with explicit schema."""
    path = _roundtrip_dir(sf, "json")
    nation = load(spark, sf, "nation")
    if not os.path.exists(path):
        nation.coalesce(1).write.mode("overwrite").json(path)
    return spark.read.json(
        path, schema="n_nationkey int, n_name string, n_regionkey int"
    ).select("n_nationkey", "n_name", "n_regionkey")


@query("b02_orc_scan", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def b02_orc_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B2: ORC source round-trip (columnar alternative to parquet;
    Spark's ORC reader supports the same pushdown/pruning as parquet —
    predicate and column pruning reach the scan)."""
    path = _roundtrip_dir(sf, "orc")
    nation = load(spark, sf, "nation")
    if not os.path.exists(path):
        nation.coalesce(1).write.mode("overwrite").orc(path)
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


# ---------------------------------------------------------------------
# B3 / B4 — projection expressions, filters
# ---------------------------------------------------------------------

@query(
    "b03_project_expr",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_o_cents('l_extendedprice')}*(100-{_o_cents('l_discount')}) AS DOUBLE)/10000
             AS net_price,
           l_returnflag || '/' || l_linestatus AS rf_ls
    FROM lineitem
    """,
)
def b03_project_expr(spark: SparkSession, sf: str) -> DataFrame:
    """B3: computed projections (exact integer-cents arithmetic).

    ``F.concat`` (= SQL ``||``, NULL-propagating), NOT ``concat_ws`` —
    ``concat_ws`` silently DROPS null operands ('R/O' becomes 'R' when
    linestatus is NULL) while ``||`` yields NULL on both engines; the
    round-9 seeded dirty corpus caught the mismatch on NULL-injected
    flag columns."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            .cast("double")
            / 10000
        ).alias("net_price"),
        F.concat("l_returnflag", F.lit("/"), "l_linestatus").alias("rf_ls"),
    )


@query(
    "b04_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity < 25 AND l_discount >= 0.05) OR l_returnflag = 'R'
    """,
)
def b04_filter(spark: SparkSession, sf: str) -> DataFrame:
    """B4: conjunctive/disjunctive filter; must appear in PushedFilters."""
    li = load(spark, sf, "lineitem")
    return li.filter(
        ((F.col("l_quantity") < 25) & (F.col("l_discount") >= 0.05))
        | (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


# ---------------------------------------------------------------------
# B5-B10 — joins
# ---------------------------------------------------------------------

@query(
    "b05_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM({_o_cents('o.o_totalprice')}) AS DOUBLE)/100 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b05_join_inner(spark: SparkSession, sf: str) -> DataFrame:
    """B5: inner equi-join orders⋈customer.

    Scale: customer is the small side at TPC-H ratios — AQE converts to a
    broadcast join at runtime; the groupBy shuffles only (segment) keys
    after map-side partial aggregation.
    """
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents("o_totalprice")).cast("double") / 100).alias("revenue"),
        )
    )


@query(
    "b06_join_left",
    oracle=f"""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS order_cnt,
           COALESCE(CAST(SUM({_o_cents('o.o_totalprice')}) AS DOUBLE)/100, 0.0) AS spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def b06_join_left(spark: SparkSession, sf: str) -> DataFrame:
    """B6: left outer join — customers with zero orders kept (count=0)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(
                F.sum(_cents("o_totalprice")).cast("double") / 100, F.lit(0.0)
            ).alias("spent"),
        )
    )


@query(
    "b06_join_full",
    oracle="""
    SELECT n.n_name, cc.c_cnt
    FROM nation n
    FULL JOIN (SELECT c_nationkey, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey) cc
      ON n.n_nationkey = cc.c_nationkey
    """,
)
def b06_join_full(spark: SparkSession, sf: str) -> DataFrame:
    """B6: full outer join — nations without customers surface NULL counts."""
    nation = load(spark, sf, "nation")
    ccnt = (
        load(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    return nation.join(
        ccnt, nation.n_nationkey == ccnt.c_nationkey, "full"
    ).select("n_name", "c_cnt")


@query(
    "b07_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def b07_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """B7: left-semi join (EXISTS)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "b07_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def b07_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """B7: left-anti join (NOT EXISTS) — customers with no finished
    order. (Every customer has SOME order in the fixture, so the
    unfiltered anti-join would be vacuously empty and prove nothing;
    the status filter keeps survivors at every gate SF.)"""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "b08_cross_join",
    oracle="SELECT r.r_name, s.s_name FROM region r CROSS JOIN supplier s",
)
def b08_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """B8: cross join of two small dims (explicitly bounded)."""
    return (
        load(spark, sf, "region")
        .crossJoin(load(spark, sf, "supplier"))
        .select("r_name", "s_name")
    )


@query(
    "b09_range_join",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def b09_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """B9: equi key + range residual — stays a hash/SMJ join on l_orderkey
    with the range predicate evaluated as a post-join filter (no
    cartesian blowup at scale)."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        li.join(orders, cond, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@query(
    "b10_broadcast_join",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_cust,
           CAST(SUM({_o_cents('c.c_acctbal')}) AS DOUBLE)/100 AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def b10_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    """B10: explicit broadcast of both dims — zero shuffle on the fact side
    until the final (r_name, n_name) aggregation."""
    cust = load(spark, sf, "customer")
    nation = F.broadcast(load(spark, sf, "nation"))
    region = F.broadcast(load(spark, sf, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(_cents("c_acctbal")).cast("double") / 100).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------
# B11 — aggregation (TPC-H Q1 = flagship)
# ---------------------------------------------------------------------

TPCH_Q1_ORACLE = f"""
WITH t AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         {_o_cents('l_extendedprice')} AS cents,
         {_o_cents('l_discount')} AS disc,
         {_o_cents('l_tax')} AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT)                                    AS sum_qty,
       CAST(SUM(cents) AS DOUBLE)/100                              AS sum_base_price,
       CAST(SUM(cents*(100-disc)) AS DOUBLE)/10000                 AS sum_disc_price,
       CAST(SUM(cents*(100-disc)*(100+tax)) AS DOUBLE)/1000000     AS sum_charge,
       ROUND(CAST(SUM(qty) AS DOUBLE)/COUNT(*), 6)                 AS avg_qty,
       ROUND(CAST(SUM(cents) AS DOUBLE)/100/COUNT(*), 6)           AS avg_price,
       ROUND(CAST(SUM(disc) AS DOUBLE)/100/COUNT(*), 6)            AS avg_disc,
       COUNT(*)                                                    AS count_order
FROM t
GROUP BY l_returnflag, l_linestatus
"""


@query("b11_tpch_q1", oracle=TPCH_Q1_ORACLE)
def b11_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """B11 flagship: TPC-H Q1 pricing summary.

    Scale: single shuffle on (returnflag, linestatus) — 6 groups — after
    map-side partial aggregation; the scan filter pushes to parquet.
    Integer-cents arithmetic keeps every sum exact and associative.
    """
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("bigint")
    cents = _cents("l_extendedprice")
    disc = _cents("l_discount")
    tax = _cents("l_tax")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        (F.sum(cents).cast("double") / 100).alias("sum_base_price"),
        (F.sum(cents * (F.lit(100) - disc)).cast("double") / 10000).alias(
            "sum_disc_price"
        ),
        (
            F.sum(cents * (F.lit(100) - disc) * (F.lit(100) + tax)).cast("double")
            / 1000000
        ).alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / cnt, 6).alias("avg_qty"),
        F.round(F.sum(cents).cast("double") / 100 / cnt, 6).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / 100 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "b11_group_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS cnt
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 2
    """,
)
def b11_group_having(spark: SparkSession, sf: str) -> DataFrame:
    """B11: group + HAVING (filter over aggregate)."""
    return (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 2)
    )


# ---------------------------------------------------------------------
# B12-B14 — distinct, approx, rollup/cube/grouping sets
# ---------------------------------------------------------------------

@query(
    "b12_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def b12_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B12: DISTINCT — shuffles on the full row; low-cardinality here."""
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "b12_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def b12_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B12: exact COUNT(DISTINCT) — Spark expands to a two-phase aggregate."""
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "b13_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus, TRUE AS within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def b13_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B13: HyperLogLog++ approx distinct, registered as a BOUNDED-CHECK
    oracle query (round-9 upgrade from rows-only): Spark computes the
    approx AND exact distinct counts per group and emits
    ``(group, within_5pct)``, where the boolean inlines the declared 5%
    relative-error bound (FIXTURES.md §3); the DuckDB oracle states the
    same groups with ``TRUE``. The raw estimate can never hash-match an
    exact engine, but the bound can — and a future HLL++ drift past 5%
    flips the boolean and breaks the hash, which rows-only checking
    could never see.

    r13 (guide §2.3): computing both in ONE agg was 2.7× superadditive —
    ``COUNT(DISTINCT)`` plans as an expand + two-phase aggregate, and the
    rsd=0.01 HLL++ sketch (~1,640 LONG buffer words per group) was carried
    through every expand/merge phase. Split into two map-side-combinable
    aggregates joined on the group key (group-cardinality rows): each leg
    shuffles only its own buffer, the HLL words never ride the expand.
    Same estimates, same exact counts — output identical by construction.
    """
    o = load(spark, sf, "orders").select("o_orderstatus", "o_custkey")
    approx = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_cust")
    )
    exact = o.groupBy(F.col("o_orderstatus").alias("__g")).agg(
        F.countDistinct("o_custkey").alias("exact_cust")
    )
    return (
        approx.join(  # null-safe: NULL status is an ordinary group
            exact, F.col("o_orderstatus").eqNullSafe(F.col("__g")), "inner"
        )
        .select(
            "o_orderstatus",
            (
                F.abs(F.col("approx_cust") - F.col("exact_cust"))
                <= F.col("exact_cust") * F.lit(0.05)
            ).alias("within_5pct"),
        )
    )


@query(
    "b14_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b14_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """B14: ROLLUP — hierarchical subtotals + grand total (NULL group keys)."""
    return (
        load(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


@query(
    "b14_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def b14_cube(spark: SparkSession, sf: str) -> DataFrame:
    """B14: CUBE — all grouping combinations."""
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("b14_grouping_sets", oracle=_GROUPING_SETS_SQL)
def b14_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """B14: GROUPING SETS — identical SQL text runs on both engines."""
    register_views(spark, sf)
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------
# B15-B17 — window functions
# ---------------------------------------------------------------------

@query(
    "b15_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey NULLS LAST,
                                         l_linenumber NULLS LAST) AS rn,
             RANK()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
             NTILE(4)     OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey NULLS LAST,
                                         l_linenumber NULLS LAST) AS tile
      FROM lineitem)
    WHERE rn <= 100
    """,
)
def b15_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    """B15: ranking windows with a SIZE-AWARE physical plan
    (``l_returnflag`` has 3 values, so a plain window sorts n/3 rows
    on one task — fine below the distrank threshold, a straggler and
    a memory hazard above it):

    * ``row_number`` over the unique DESC ordering →
      ``distrank.two_level_row_number(mode="auto")``: the naive
      single window below ``spark.event_streamer.distrank.
      naiveMaxBytes`` (8 GiB default on local masters — measured 4-5×
      faster there), the bucketed two-level decomposition above it
      (flip proven at sf10; two-level plan pinned by the forced-flip
      leg of ``test_window_rank_bucket_pruned_topk``).
    * ``rank``/``dense_rank`` over the tied ``l_quantity`` ordering →
      ``distrank.tied_ranks``: the rank structure lives in the tiny
      per-(flag, quantity) count table, broadcast back.
    * ``ntile(4)`` over the unique ordering → arithmetic on the global
      row number (``distrank.ntile_expr``).
    """
    from event_streamer_spark.operators.distrank import (
        ntile_expr,
        tied_rank_table,
        two_level_row_number,
    )

    li = load(spark, sf, "lineitem")
    # prune BEFORE the two-level call: its persist() caches its input
    # frame, so hand it only the 5 columns the query needs, not all 16
    shared: dict = {}
    ranked = two_level_row_number(
        li.select(
            "l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_quantity",
        ),
        ["l_returnflag"],
        # tiebreak NULLS LAST explicitly on BOTH engines (r12, sf1-grain
        # hostile seed 20260901): Spark's bare-ASC default is NULLS
        # FIRST where DuckDB's is NULLS LAST, so an injected NULL
        # l_orderkey inside an extendedprice tie group scrambled every
        # rn after it — only visible once the corpus is big enough for
        # a NULL to collide with a tie inside the top-100
        [
            F.desc("l_extendedprice"),
            F.asc_nulls_last("l_orderkey"),
            F.asc_nulls_last("l_linenumber"),
        ],
        bucket_value=-F.col("l_extendedprice"),
        out_col="rn",
        count_col="__n",
        rn_limit=100,  # bucket-pruned top-k: the sort sees ~1/32 of rows
        # NOT mode="auto" (tried round 8, reverted with measurements):
        # naive halves the cold pass (1.8 vs 3.5 s at sf0.1) but
        # DOUBLES warm (1.42 vs 0.71 s) because this query's three
        # window consumers (counts, top-k sort, ntile denominators)
        # share the two-level path's cached bucketed frame and the
        # naive path re-sorts per pass with nothing to share. The
        # single-consumer distrank call sites DO run auto.
        mode="two_level",
        cached_out=shared,
    )
    # tied rank lookup from the PERSISTED bucketed frame (r13, guide
    # §5.3): it holds exactly the input rows (plus __bucket), so the
    # (flag, quantity) counts are identical — and the second full fact
    # scan per run becomes a read of the already-cached narrow frame.
    # One fact pass for the whole query instead of two; broadcast onto
    # the 300 surviving rows — running the two-level pipeline through
    # the rank aggregate would recompute it entirely.
    ranks = tied_rank_table(
        shared.get("bucketed", li), ["l_returnflag"], "l_quantity",
        descending=True, rank_col="rnk", dense_rank_col="drnk",
    )
    from event_streamer_spark.operators.distrank import _nullsafe_equi_join

    return (
        # NULL-safe: a NULL returnflag is an ordinary window partition
        # and NULL quantities rank NULLS LAST on both engines — a plain
        # name join would drop both classes of rows (round-9 dirty
        # corpus)
        _nullsafe_equi_join(
            ranked, F.broadcast(ranks), ["l_returnflag", "l_quantity"]
        )
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "rn",
            "rnk",
            "drnk",
            ntile_expr(F.col("rn"), F.col("__n"), 4).alias("tile"),
        )
    )


@query(
    "b16_window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey,
           LAG(o_totalprice)  OVER w AS prev_total,
           LEAD(o_totalprice) OVER w AS next_total,
           FIRST_VALUE(o_totalprice) OVER w AS first_total,
           LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate NULLS LAST,
                                                    o_orderkey NULLS LAST,
                                                    o_totalprice NULLS LAST
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND UNBOUNDED FOLLOWING) AS last_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST,
                          o_totalprice NULLS LAST)
    """,
)
def b16_window_analytic(spark: SparkSession, sf: str) -> DataFrame:
    """B16: lag/lead/first/last (values pass through unchanged → hash-safe).
    NULL order keys pinned NULLS LAST on both engines (round-9 dirty
    corpus: Spark's ASC default is NULLS FIRST, DuckDB's NULLS LAST —
    left implicit, every lag/lead in a partition with a NULL-dated
    order shifts by one). The windowed VALUE rides as final tiebreak
    (the b16_ignore_nulls rule): (orderdate, orderkey) is not total
    under conflicting duplicate orderkeys, and lag/lead of the two
    copies' different totalprice was run-arbitrary — intermittent on
    the seed-20260819+skew mega-customer corpus."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
        F.col("o_totalprice").asc_nulls_last(),
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_total"),
        F.lead("o_totalprice").over(w).alias("next_total"),
        F.first("o_totalprice").over(w).alias("first_total"),
        F.last("o_totalprice").over(w_full).alias("last_total"),
    )


@query(
    "b17_window_frame",
    oracle=f"""
    WITH t AS (SELECT o_orderkey, o_custkey, o_orderdate,
                      {_o_cents('o_totalprice')} AS cents FROM orders)
    SELECT o_orderkey, o_custkey,
           CAST(SUM(cents) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate NULLS LAST,
                                          o_orderkey NULLS LAST,
                                          cents NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100 AS run_total,
           CAST((10000 * SUM(cents) OVER w3) // (COUNT(*) OVER w3)
                AS DOUBLE) / 1000000 AS mov_avg
    FROM t
    WINDOW w3 AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST,
                           cents NULLS LAST
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def b17_window_frame(spark: SparkSession, sf: str) -> DataFrame:
    """B17: aggregate-over-frame — running total + 3-row moving average.
    NULL order keys pinned NULLS LAST on both engines (the b16 round-9
    dirty-corpus lesson: implicit ASC defaults diverge). The moving
    average is computed in EXACT integer micro-dollars then converted
    once to double (deterministic IEEE int→double) — ROUND(sum/100/n,
    6) at 1e11-dollar magnitudes is a 1-ulp lottery between the
    engines' ROUND implementations (dirty seed 31337)."""
    orders = load(spark, sf, "orders").withColumn("cents", _cents("o_totalprice"))
    # cents as final tiebreak: the running sums are order-sensitive
    # across conflicting duplicate orderkeys (the b16 seed-20260819
    # +skew lesson) — without it the per-copy prefix sums are
    # run-arbitrary
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
        F.col("cents").asc_nulls_last(),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum("cents").over(w_run).cast("double") / 100).alias("run_total"),
        # integer DIV (not float division + cast: that would round at
        # 2^53 before truncating); 10000·sum ≤ 1e18 stays in BIGINT,
        # ANSI would fail loudly past it
        F.expr(
            "CAST((10000 * SUM(cents) OVER ("
            "  PARTITION BY o_custkey"
            "  ORDER BY o_orderdate ASC NULLS LAST,"
            "           o_orderkey ASC NULLS LAST,"
            "           cents ASC NULLS LAST"
            "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) DIV"
            " COUNT(*) OVER ("
            "  PARTITION BY o_custkey"
            "  ORDER BY o_orderdate ASC NULLS LAST,"
            "           o_orderkey ASC NULLS LAST,"
            "           cents ASC NULLS LAST"
            "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
            " AS DOUBLE) / 1000000"
        ).alias("mov_avg"),
    )


# ---------------------------------------------------------------------
# B18-B20 — sort/limit/top-k, set operations
# ---------------------------------------------------------------------

@query(
    "b18_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def b18_topk(spark: SparkSession, sf: str) -> DataFrame:
    """B18: global top-k — Spark runs TakeOrderedAndProject (per-partition
    top-k + driver merge of k·P rows), no full sort shuffle."""
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "b19_union_all",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION ALL
    SELECT o_custkey AS k FROM orders
    """,
)
def b19_union_all(spark: SparkSession, sf: str) -> DataFrame:
    """B19: UNION ALL — pure concatenation, no shuffle."""
    c = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.unionAll(o)


@query(
    "b19_union_distinct",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION
    SELECT o_custkey AS k FROM orders
    """,
)
def b19_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B19: UNION DISTINCT."""
    c = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.union(o).distinct()


@query(
    "b20_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders
    """,
)
def b20_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """B20: INTERSECT (distinct semantics)."""
    c = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


@query(
    "b20_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def b20_except(spark: SparkSession, sf: str) -> DataFrame:
    """B20: EXCEPT (distinct semantics — DataFrame.subtract): customers
    who never placed an urgent order. (Unfiltered, every custkey appears
    in orders and the difference is vacuously empty at every SF.)"""
    c = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------------
# B21-B23 — scalar function library
# ---------------------------------------------------------------------

@query(
    "b21_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_type, 1, 5) AS type_pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           trim(' ' || p_name || ' ') AS name_trim,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           array_to_string(list_transform(string_split(lower(p_name), ' '),
                                          x -> upper(x[1]) || x[2:]), ' ') AS name_title,
           (p_name LIKE '%row%') AS has_row
    FROM part
    """,
)
def b21_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B21: string functions incl. initcap (DuckDB lacks it → emulated)."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.initcap(F.lower("p_name")).alias("name_title"),
        F.col("p_name").like("%row%").alias("has_row"),
    )


@query(
    "b22_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(datediff('day', o_orderdate, DATE '1998-01-01') AS BIGINT) AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def b22_date_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B22: date/time functions (session timezone pinned to UTC)."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).cast(
            "bigint"
        ).alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "b23_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(ceil(l_extendedprice/1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice/1000) AS BIGINT) AS price_k_floor,
           ROUND(CASE WHEN l_extendedprice > 0
                      THEN ln(l_extendedprice) END, 6) AS ln_price,
           ROUND(CASE WHEN l_quantity >= 0
                      THEN sqrt(l_quantity) END, 6) AS sqrt_qty,
           ROUND(pow(l_discount, 2), 6) AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def b23_math_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B23: math functions; transcendentals rounded to absorb libm ulp
    noise. Out-of-domain inputs pinned round 9 (seeded dirty corpus):
    DuckDB RAISES on sqrt/ln of a negative (Out of Range) while Spark
    yields NaN (sqrt) or NULL (ln) — the portable recipe is an explicit
    domain CASE yielding NULL on both engines, which also keeps one bad
    row from aborting a 100 TB scan on the strict engine."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_floor"),
        F.round(
            F.when(F.col("l_extendedprice") > 0, F.log(F.col("l_extendedprice"))),
            6,
        ).alias("ln_price"),
        F.round(
            F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")), 6
        ).alias("sqrt_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


# ---------------------------------------------------------------------
# B24-B27 — arrays, structs, JSON, conditionals
# ---------------------------------------------------------------------

@query(
    "b24_array_fns",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           list_contains(toks, 'data') AS has_data,
           toks[1] AS first_tok,
           array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted
    FROM t
    """,
)
def b24_array_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B24: array functions over tokenized documents."""
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    return d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.array_contains("toks", "data").alias("has_data"),
        F.element_at("toks", 1).alias("first_tok"),
        F.array_join(F.slice(F.sort_array("toks"), 1, 3), ",").alias("first3_sorted"),
    )


@query(
    "b25_struct_fns",
    oracle="""
    SELECT c_custkey,
           struct_extract(struct_pack(name := c_name, bal := c_acctbal), 'name') AS name2,
           struct_extract(struct_pack(name := c_name, bal := c_acctbal), 'bal') AS bal2
    FROM customer
    """,
)
def b25_struct_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B25: struct construction + field extraction round-trip."""
    c = load(spark, sf, "customer").withColumn(
        "s", F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    )
    return c.select(
        "c_custkey",
        F.col("s.name").alias("name2"),
        F.col("s.bal").alias("bal2"),
    )


@query(
    "b26_json_fns",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k_int
    FROM events
    """,
)
def b26_json_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B26: JSON extraction from the events.props string column.
    Malformed-input divergence pinned round 9 (seeded dirty corpus):
    Spark's ``get_json_object``/``from_json`` yield NULL on unparseable
    input while DuckDB's ``json_extract`` RAISES — the oracle guards
    with ``json_valid`` (the a03 pattern); Spark's lenient NULL IS the
    guarded behavior."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k bigint").getField("k").alias("k_int"),
    )


@query(
    "b27_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
           (c_acctbal IS NULL) AS bal_null
    FROM customer
    """,
)
def b27_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """B27: CASE/WHEN, coalesce, nullif, null predicate (3-valued logic)."""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg2"
        ),
        F.isnull("c_acctbal").alias("bal_null"),
    )


# ---------------------------------------------------------------------
# B28/B29 — subqueries & CTEs (identical SQL text on both engines)
# ---------------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
"""


@query("b28_subqueries", oracle=_SUBQUERY_SQL)
def b28_subqueries(spark: SparkSession, sf: str) -> DataFrame:
    """B28: IN-subquery + scalar subquery — same SQL text on both engines."""
    register_views(spark, sf)
    return spark.sql(_SUBQUERY_SQL)


_CTE_SQL = """
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS cnt,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS spent
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, co.cnt, co.spent
FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
WHERE co.cnt >= 2
"""


@query("b29_cte", oracle=_CTE_SQL)
def b29_cte(spark: SparkSession, sf: str) -> DataFrame:
    """B29: CTE — same SQL text on both engines."""
    register_views(spark, sf)
    return spark.sql(_CTE_SQL)


# ---------------------------------------------------------------------
# B30 — UDF / pandas UDF (Arrow-batched; never row-at-a-time Python)
# ---------------------------------------------------------------------

@query(
    "b30_pandas_udf",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_o_cents('l_extendedprice')}*(100-{_o_cents('l_discount')}) AS DOUBLE)/10000
             AS net_price
    FROM lineitem
    """,
)
def b30_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B30: scalar pandas UDF (Arrow-vectorized int64 math, exact)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def net_price(ep: pd.Series, disc: pd.Series) -> pd.Series:
        import numpy as np

        # Two dirty-corpus pins (round 9) in one body: (a) nullable
        # Int64, not int64 — a NULL price/discount arrives as NaN and a
        # plain astype raises IntCastingNaNError, killing the whole
        # Arrow batch; NA propagates to a NULL output like the SQL leg.
        # (b) HALF-AWAY-FROM-ZERO rounding, not pandas' .round() —
        # numpy rounds half-even, so a 0.005 price became 0 cents while
        # both engines' SQL ROUND says 1 (the b23_round_tie class).
        def away(v: pd.Series) -> pd.Series:
            return pd.Series(
                pd.array(
                    np.sign(v) * np.floor(np.abs(v) + 0.5), dtype="Float64"
                ).astype("Int64")
            )

        cents = away(ep * 100)
        d = away(disc * 100)
        return pd.Series(
            ((cents * (100 - d)).astype("Float64") / 10000).astype("float64")
        )

    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "b30_grouped_agg_udf",
    oracle=f"""
    WITH t AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                      {_o_cents('l_extendedprice')} AS cents FROM lineitem)
    SELECT l_returnflag,
           ROUND(CAST(SUM(cents*qty) AS DOUBLE)/100 / SUM(qty), 6) AS wavg_price
    FROM t GROUP BY l_returnflag
    """,
)
def b30_grouped_agg_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B30: grouped applyInPandas — quantity-weighted average price.

    Scale: groups are tiny (3 flags); for high-cardinality keys this
    pattern shuffles once on the group key, identical to a built-in agg.
    """

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # NULL-aware to match the SQL aggregate semantics (round-9
        # dirty corpus): SUM(cents*qty) skips rows where EITHER side is
        # NULL, SUM(qty) skips only NULL quantities, and CAST(qty AS
        # BIGINT) truncates toward zero; int64 arithmetic throughout
        # for exactness at 1e13-cent magnitudes
        both = pdf["l_extendedprice"].notna() & pdf["l_quantity"].notna()
        ep = pdf.loc[both, "l_extendedprice"] * 100
        # half-away-from-zero to match SQL ROUND (numpy rounds half-even)
        cents = (np.sign(ep) * np.floor(np.abs(ep) + 0.5)).astype("int64")
        qty = np.trunc(pdf.loc[both, "l_quantity"]).astype("int64")
        den = np.trunc(pdf.loc[pdf["l_quantity"].notna(), "l_quantity"]).astype(
            "int64"
        ).sum()
        val = (
            round(float((cents * qty).sum()) / 100 / float(den), 6)
            if den != 0
            else None
        )
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "wavg_price": [val]}
        )

    li = load(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        wavg, "l_returnflag string, wavg_price double"
    )
