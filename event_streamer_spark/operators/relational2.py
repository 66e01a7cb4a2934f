"""Batch relational surface, part 2: pivot, statistics, percentiles,
extended scalar-function coverage, correlated subqueries, lexicon joins
(SURVEY §2.B deep coverage + §2.D D4 sentiment).

Determinism notes per query; same protocol as ``relational`` (integer
cents, magnitude-sized rounding grains for floating aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load, register_views


@query(
    "b14_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS cnt_F,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS cnt_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b14_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """B14: pivot with explicit value list (no value-discovery job —
    at scale never let pivot() scan for distinct values)."""
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("F", "cnt_F")
        .withColumnRenamed("O", "cnt_O")
        .na.fill({"cnt_F": 0, "cnt_O": 0})
    )


# b11_stats_agg exact-moment fragments, shared verbatim by both engines
# (hostile seed 20260820: a 9.9e11-dollar price lifts var_samp to
# ~4.6e20 where the engines' single-pass co-moment mergers disagree by
# ~6.5e4 — far past any fixed rounding grain; the d14/d15 exact-moment
# protocol applies).  xc/yc = integer cents; x-only moments use every
# non-NULL xc (the builtin stddev/var NULL rule), pair moments use
# pairwise-complete rows (the builtin corr/covar NULL rule).  All sums
# are exact DECIMAL; the finals are ONE double expression evaluated on
# identical exact inputs on both engines, so the doubles are
# bit-identical and no ROUND (itself a b23-pinned tie hazard) is
# needed.  Σxc² bound: ≤ (1e14 cents)²·rows — DECIMAL(38,0) holds to
# ~1e9 max-magnitude rows; beyond that, shard and merge the moment
# table (it is additive).
_B11_MOMENTS = """
  CAST(COUNT(xc) AS BIGINT)                                  AS nx,
  SUM(CAST(xc AS DECIMAL(38,0)))                             AS sx,
  SUM(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS sxx,
  CAST(COUNT(CASE WHEN xc IS NOT NULL AND yc IS NOT NULL
                  THEN 1 END) AS BIGINT)                     AS np,
  SUM(CASE WHEN yc IS NOT NULL
           THEN CAST(xc AS DECIMAL(38,0)) END)               AS px,
  SUM(CASE WHEN xc IS NOT NULL
           THEN CAST(yc AS DECIMAL(38,0)) END)               AS py,
  SUM(CAST(xc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) AS pxy,
  SUM(CASE WHEN yc IS NOT NULL
           THEN CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))
      END)                                                   AS pxx,
  SUM(CASE WHEN xc IS NOT NULL
           THEN CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))
      END)                                                   AS pyy
"""

_B11_VAR_C = (
    "(CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE))"
    " / (CAST(nx AS DOUBLE) - 1)"
)
_B11_DX = (
    "(CAST(np AS DOUBLE) * CAST(pxx AS DOUBLE)"
    " - CAST(px AS DOUBLE) * CAST(px AS DOUBLE))"
)
_B11_DY = (
    "(CAST(np AS DOUBLE) * CAST(pyy AS DOUBLE)"
    " - CAST(py AS DOUBLE) * CAST(py AS DOUBLE))"
)
_B11_FINALS = f"""
  CASE WHEN nx >= 2
       THEN SQRT(GREATEST({_B11_VAR_C}, 0.0)) / 100.0 END AS sd_price,
  CASE WHEN nx >= 2 THEN {_B11_VAR_C} / 10000.0 END       AS var_price,
  CASE WHEN np >= 2 AND {_B11_DX} > 0 AND {_B11_DY} > 0
       THEN (CAST(np AS DOUBLE) * CAST(pxy AS DOUBLE)
             - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
            / SQRT({_B11_DX} * {_B11_DY}) END             AS qty_price_corr,
  CASE WHEN np >= 2
       THEN (CAST(pxy AS DOUBLE)
             - CAST(px AS DOUBLE) * CAST(py AS DOUBLE) / CAST(np AS DOUBLE))
            / (CAST(np AS DOUBLE) - 1) / 10000.0 END      AS qty_price_cov
"""

# ONE SQL text, run verbatim by BOTH engines (Spark via register_views
# — every construct here is shared dialect), so the double arithmetic
# is op-for-op identical by construction.
_B11_STATS_SQL = f"""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT)      AS yc,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS xc
      FROM lineitem),
    m AS (
      SELECT l_returnflag, {_B11_MOMENTS}
      FROM c GROUP BY l_returnflag)
    SELECT l_returnflag, {_B11_FINALS}
    FROM m
    """


@query("b11_stats_agg", oracle=_B11_STATS_SQL)
def b11_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B11: statistical aggregates (sample stddev/variance of price,
    quantity-price correlation and covariance per return flag) — via
    EXACT integer-cents moment sums rather than the engines' built-in
    single-pass co-moment aggregates: the builtins' merge order
    differs per engine AND per run, which the round-10 hostile corpus
    promoted from ulp noise to a 6.5e4 absolute split once a
    9.9e11-dollar price entered the sums (see ``_B11_MOMENTS``). The
    finals are one shared double expression over exact sums —
    bit-identical cross-engine at any magnitude, emitted unrounded.
    Degenerate groups (n<2, zero variance) yield NULL via exact
    integer guards on both engines.

    Scale: one map-side-combinable aggregate (9 exact sums per group)
    — the same shuffle profile as the builtin version; the moment
    table is additive across shards, so incremental/streaming merges
    stay exact.
    """
    register_views(spark, sf)
    return spark.sql(_B11_STATS_SQL)


@query(
    "b11_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           ROUND(median(l_extendedprice), 6) AS med
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b11_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """B11: exact interpolated percentiles (both engines sort + linearly
    interpolate — identical arithmetic, 6dp absorbs any ulp).

    r13 (guide §2.2 / §5.2): Catalyst's exact ``percentile`` aggregate
    collects EVERY group value into one task's buffer — with a 3-value
    group key that is the same hot-group scale-killer ``d15_anomaly_mad``
    documents, times four buffers (one per requested quantile). Rewritten
    as a distributed order statistic over ONE ranking pass
    (``distrank.two_level_row_number``, the b48/d15 machinery): rank rows
    within each group, keep only the ≤2 boundary rows per quantile, and
    interpolate with the engines' shared rule
    ``v_lo*(ceil(h)-h) + v_hi*(h-floor(h))`` at ``h=(n-1)q``. NULL values
    occupy no rank (SQL aggregate convention); group keys whose values
    are all NULL survive via the group-keys left join, exactly as the
    aggregate form behaved. Value-identical vs the unchanged oracle at 3
    SFs + the hostile corpus.
    """
    from event_streamer_spark.operators.distrank import two_level_row_number

    li = load(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    ranked = two_level_row_number(
        li.filter(F.col("l_extendedprice").isNotNull()),
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        bucket_value="l_extendedprice",
        out_col="rn",
        count_col="n",
        mode="auto",
    )
    qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75}
    n, rn = F.col("n"), F.col("rn")

    def _h(q):  # 0-based fractional position of quantile q
        return (n - 1).cast("double") * F.lit(q)

    keep = None
    for q in qs.values():
        cond = (rn == F.floor(_h(q)) + 1) | (rn == F.ceil(_h(q)) + 1)
        keep = cond if keep is None else (keep | cond)
    aggs = [F.max("n").alias("n")]
    for name, q in qs.items():
        aggs.append(
            F.max(
                F.when(rn == F.floor(_h(q)) + 1, F.col("l_extendedprice"))
            ).alias(f"{name}_lo")
        )
        aggs.append(
            F.max(
                F.when(rn == F.ceil(_h(q)) + 1, F.col("l_extendedprice"))
            ).alias(f"{name}_hi")
        )
    stats = ranked.filter(keep).groupBy("l_returnflag").agg(*aggs)

    def _interp(name, q):
        h = (F.col("n") - 1).cast("double") * F.lit(q)
        lo_v, hi_v = F.col(f"{name}_lo"), F.col(f"{name}_hi")
        exact = F.floor(h) == F.ceil(h)
        return F.round(
            F.when(exact, lo_v).otherwise(
                lo_v * (F.ceil(h) - h) + hi_v * (h - F.floor(h))
            ),
            6,
        )

    groups = li.select("l_returnflag").distinct()
    # null-safe: a NULL group KEY is an ordinary group (its non-NULL
    # values rank normally) — hostile-corpus case
    return groups.join(
        stats.withColumnRenamed("l_returnflag", "__g"),
        F.col("l_returnflag").eqNullSafe(F.col("__g")),
        "left",
    ).select(
        "l_returnflag",
        _interp("p25", 0.25).alias("p25"),
        _interp("p50", 0.50).alias("p50"),
        _interp("p75", 0.75).alias("p75"),
        _interp("p50", 0.50).alias("med"),
    )


@query(
    "b11_collect_agg",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ','
                      ORDER BY o_orderkey, o_orderstatus) AS statuses,
           CAST(MAX(o_orderkey) AS BIGINT) AS last_order
    FROM orders GROUP BY o_custkey
    """,
)
def b11_collect_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B11: ordered collect/string aggregation (deterministic via sort
    before aggregation + unique order key).

    Two hostile-corpus pins (seed 20260830, sf0.1 grain — the first
    divergence a fresh seed has surfaced since 20260823):

    * **All-NULL groups**: ``concat_ws`` over a list with no non-NULL
      element returns ``''`` while ``string_agg`` returns NULL — a
      customer whose every order status is NULLed diverged. Rule
      pinned: NULL (the SQL aggregate convention), via the
      ``count(col) > 0`` guard below.
    * **Duplicate-key ties** (latent, same class as d6's NULLS-LAST
      pin): the struct sort tie-breaks equal order keys by STATUS,
      the oracle's bare ``ORDER BY o_orderkey`` left tie order
      engine-arbitrary; both sides now order by (key, status).

    Clean-fixture output is byte-identical to prior rounds (unique
    keys, no NULL statuses there).
    """
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.when(
                F.count("o_orderstatus") > 0,
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.collect_list(
                            F.struct("o_orderkey", "o_orderstatus")
                        )
                    ).getField("o_orderstatus"),
                ),
            ).alias("statuses"),
            F.max("o_orderkey").alias("last_order"),
        )
    )


@query(
    "b11_bool_bit_agg",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor
    FROM orders GROUP BY o_orderstatus
    """,
)
def b11_bool_bit_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B11: boolean/bitwise aggregates (order-insensitive by definition)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@query(
    "b11_max_by",
    oracle="""
    SELECT o_orderstatus,
           CAST(arg_max(o_orderkey, o_orderkey) AS BIGINT) AS max_key,
           CAST(arg_min(o_orderkey, o_orderkey) AS BIGINT) AS min_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def b11_max_by(spark: SparkSession, sf: str) -> DataFrame:
    """B11: arg-max/arg-min over a unique ordering key (ties impossible)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("max_key"),
        F.min_by("o_orderkey", "o_orderkey").alias("min_key"),
    )


@query(
    "b15_percent_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist()    OVER w, 6) AS cd
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice NULLS LAST,
                          l_orderkey NULLS LAST,
                          l_linenumber NULLS LAST)
    """,
)
def b15_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    """B15: percent_rank / cume_dist over a unique total ordering —
    computed DISTRIBUTED via the two-level row_number decomposition
    (``distrank.two_level_row_number``), not a 3-partition global sort:
    ``l_returnflag`` has 3 values, so the naive window sorts n/3 rows on
    one task. With a unique ordering, ``percent_rank = (rn-1)/(n-1)``
    and ``cume_dist = rn/n`` exactly."""
    from event_streamer_spark.operators.distrank import two_level_row_number

    li = load(spark, sf, "lineitem")
    # prune before the call — two_level persists its input frame
    # NULL placement pinned explicitly (round-9 dirty corpus): Spark's
    # ASC default is NULLS FIRST, DuckDB's is NULLS LAST — and the
    # two-level path's dedicated NULL bucket is LAST-aligned
    ranked = two_level_row_number(
        li.select(
            "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
        ),
        ["l_returnflag"],
        [
            F.col("l_extendedprice").asc_nulls_last(),
            F.col("l_orderkey").asc_nulls_last(),
            F.col("l_linenumber").asc_nulls_last(),
        ],
        bucket_value="l_extendedprice",
        out_col="__rn",
        count_col="__n",
        mode="auto",  # size-aware: naive below the local threshold
    )
    from event_streamer_spark.operators.distrank import percent_rank_expr

    # Tie correction (round-9 dirty corpus: exact duplicate rows tie on
    # the full ordering): SQL percent_rank is RANK-based — tied rows
    # share the FIRST row_number of their tie group — and cume_dist is
    # the tie group's LAST. The tie-group window partitions on the full
    # ordering key (near-unique), so it adds no straggler; with a truly
    # unique ordering min(rn) == max(rn) == rn and this is a no-op.
    w_tie = Window.partitionBy(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    tied = ranked.withColumn("__rk", F.min("__rn").over(w_tie)).withColumn(
        "__cdn", F.max("__rn").over(w_tie)
    )
    rk, cdn, n = F.col("__rk"), F.col("__cdn"), F.col("__n")
    return tied.select(
        "l_orderkey",
        "l_linenumber",
        # single-row partitions yield 0.0, not a div-by-zero NULL
        percent_rank_expr(rk, n).alias("pr"),
        F.round(cdn.cast("double") / n, 6).alias("cd"),
    )


@query(
    "b15_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_orderkey) AS BIGINT) AS quartile
    FROM orders
    """,
)
def b15_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """B15: ntile bucketing over a unique ordering key (deterministic —
    o_orderkey is unique within each partition, so bucket boundaries are
    identical in any engine). Reference has no windowing; declared per
    SURVEY §2.B15."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "b16_ignore_nulls",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_totalprice END AS val
      FROM orders)
    SELECT o_orderkey,
           FIRST_VALUE(val IGNORE NULLS) OVER w AS first_nn,
           LAST_VALUE(val IGNORE NULLS)  OVER w AS last_nn
    FROM t
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_orderkey, val NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def b16_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """B16+: IGNORE NULLS analytics — running first/last NON-NULL value
    (gap-filling / last-observation-carried-forward, the time-series
    staple). Nulls synthesized deterministically (orderkey % 7). One
    shuffle on the partition key; the frame is a running scan."""
    o = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("val"),
    )
    # val tiebreak (NULLS LAST pinned both sides): o_orderkey alone is
    # not a total order once the hostile corpus injects conflicting
    # duplicate keys — tied rows then enter the running frame in
    # engine-arbitrary order and last_nn diverges (round-10 sf0.01
    # corpus, seed 20260819)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_orderkey"), F.col("val").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.first("val", ignorenulls=True).over(w).alias("first_nn"),
        F.last("val", ignorenulls=True).over(w).alias("last_nn"),
    )


@query(
    "b24_posexplode",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
    FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)
    """,
)
def b24_posexplode(spark: SparkSession, sf: str) -> DataFrame:
    """B24+: positional explode (LATERAL VIEW posexplode) — the
    tokenize-with-position primitive every sequence op builds on.
    Narrow generate stage, no shuffle; output is bounded by token count
    (row-group-sized batches at 100 TB)."""
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    return d.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("bigint"))


@query(
    "b20_set_ops_all",
    oracle="""
    WITH a AS (SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q
               FROM lineitem WHERE l_orderkey % 3 = 0),
    b AS (SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q
          FROM lineitem WHERE l_orderkey % 2 = 0),
    i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
    e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT 'intersect_all' AS op, f, q, COUNT(*) AS n FROM i GROUP BY f, q
    UNION ALL
    SELECT 'except_all' AS op, f, q, COUNT(*) AS n FROM e GROUP BY f, q
    """,
)
def b20_set_ops_all(spark: SparkSession, sf: str) -> DataFrame:
    """B20+: bag-semantics set operations — INTERSECT ALL keeps
    min(multiplicity), EXCEPT ALL subtracts multiplicities (vs the
    distinct variants in b20). Result rolled up per (flag, quantity) so
    the output contract is order-free. Both compile to aggregation +
    join on the row value — shuffle on the uniform composite key.
    """
    li = load(spark, sf, "lineitem")
    a = li.filter(F.col("l_orderkey") % 3 == 0).select(
        F.col("l_returnflag").alias("f"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    b = li.filter(F.col("l_orderkey") % 2 == 0).select(
        F.col("l_returnflag").alias("f"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    i = (
        a.intersectAll(b)
        .groupBy("f", "q")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "f", "q", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("f", "q")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "f", "q", "n")
    )
    return i.unionAll(e)


@query(
    "b48_exact_median",
    oracle="""
    SELECT l_returnflag,
           CAST(median(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) AS median_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b48_exact_median(spark: SparkSession, sf: str) -> DataFrame:
    """B48: EXACT per-group median as a distributed order statistic —
    rank every row with the two-level decomposition, keep the middle
    rank(s), average them (even-n rule matches DuckDB's ``median``).
    ``percentile_approx`` (B11) is the sketch answer; this is the exact
    one WITHOUT sorting a whole 3-value partition key on one task.
    Integer cents so the even-n midpoint average is float-exact.
    """
    from event_streamer_spark.operators.distrank import (
        middle_ranks,
        two_level_row_number,
    )

    li = (
        load(spark, sf, "lineitem")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        # SQL MEDIAN ignores NULL values (they must not occupy ranks or
        # count toward n) while NULL group KEYS stay ordinary groups —
        # round-9 dirty corpus
        .filter(F.col("cents").isNotNull())
    )
    ranked = two_level_row_number(
        li,
        ["l_returnflag"],
        ["cents", "l_orderkey", "l_linenumber"],
        bucket_value="cents",
        out_col="rn",
        count_col="n",
        mode="auto",  # size-aware: naive below the local threshold
    )
    return (
        ranked.filter(middle_ranks(F.col("rn"), F.col("n")))
        .groupBy("l_returnflag")
        .agg(F.avg("cents").alias("median_cents"))
    )


@query(
    "b47_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01')
    SELECT strftime(months.m, '%Y-%m') AS month,
           COUNT(o_orderkey) AS n_orders
    FROM months
    LEFT JOIN orders ON date_trunc('month', o_orderdate) = months.m
    GROUP BY months.m
    ORDER BY month
    """,
)
def b47_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """B47: recursive CTE (Spark 4 WITH RECURSIVE) — generate the full
    1995–2001 month calendar recursively and LEFT JOIN order counts, so
    months with zero orders appear (calendar gap-filling, the reporting
    staple that a plain GROUP BY silently drops).

    Scale: the recursion materializes 80 rows (driver-trivial); the
    fill join broadcasts them against the aggregated per-month counts.
    """
    register_views(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01')
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               COUNT(o_orderkey) AS n_orders
        FROM months
        LEFT JOIN orders ON date_trunc('month', o_orderdate) = months.m
        GROUP BY months.m
        ORDER BY month
        """
    )


@query(
    "b30_grouped_map",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           ROUND(o_totalprice
                 - AVG(o_totalprice) OVER (PARTITION BY o_orderstatus), 4)
             AS centered
    FROM orders
    """,
)
def b30_grouped_map(spark: SparkSession, sf: str) -> DataFrame:
    """B30+ (§2.D): grouped-map ``applyInPandas`` — whole-group pandas
    transform (per-status mean-centering), the split-apply-combine UDF
    shape. One shuffle on the group key, Arrow both ways. The oracle is
    the equivalent window expression.
    """

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_orderkey", "o_orderstatus"]].copy()
        out["centered"] = (
            pdf["o_totalprice"] - pdf["o_totalprice"].mean()
        ).round(4)
        return out

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.groupBy("o_orderstatus").applyInPandas(
        center, "o_orderkey bigint, o_orderstatus string, centered double"
    )


@query(
    "b30_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
    FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)
    """,
)
def b30_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """B30+ (§2.D): Python UDTF (table function) via LATERAL join — the
    one-row-to-many-rows UDF shape (Spark 4's ``@udtf``). The tokenizer
    UDTF reproduces ``posexplode`` semantics so the oracle is exact;
    UDTF rows stream through Arrow batches — per-partition, no shuffle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, tok: string")
    class Tokenize:
        def eval(self, text: str):
            # NULL text → NO rows, matching the SQL leg where
            # string_split(NULL) unnests to nothing (round-9 dirty
            # corpus: `or ""` emitted a phantom empty token per NULL
            # doc); empty text keeps its single '' token on both
            if text is None:
                return
            for i, t in enumerate(text.split(" ")):
                yield (i, t)

    spark.udtf.register("es_tokenize", Tokenize)
    register_views(spark, sf)
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok FROM documents, LATERAL es_tokenize(text) t"
    )


@query(
    "b21_string_fns2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_pad,
           rpad(p_brand, 12, '.') AS brand_rpad,
           repeat(p_brand, 2) AS brand2,
           reverse(p_name) AS name_rev,
           translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
           CAST(ascii(p_type) AS BIGINT) AS type_ascii,
           left(p_name, 4) AS name_l4,
           right(p_name, 4) AS name_r4,
           CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
           CASE WHEN p_type IS NULL THEN NULL
                ELSE split_part(p_type, ' ', 1) END AS type_first
    FROM part
    """,
)
def b21_string_fns2(spark: SparkSession, sf: str) -> DataFrame:
    """B21: extended string functions. Divergence pinned round 9 (the
    seeded dirty corpus): DuckDB ``split_part(NULL, ' ', 1)`` returns
    '' (and ignores a NULL delimiter) while Spark null-propagates —
    the portable recipe is an explicit IS NULL guard in the SQL
    spelling; Spark's native NULL propagation IS the guarded
    behavior."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_tr"),
        F.ascii("p_type").cast("bigint").alias("type_ascii"),
        F.expr("left(p_name, 4)").alias("name_l4"),
        F.expr("right(p_name, 4)").alias("name_r4"),
        F.instr("p_name", "a").cast("bigint").alias("a_pos"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_first"),
    )


@query(
    "b22_date_fns2",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS week_no,
           CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday_no,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus_45d,
           strftime(make_date(2024, month(o_orderdate), 1), '%Y-%m-%d') AS in_2024
    FROM orders
    """,
)
def b22_date_fns2(spark: SparkSession, sf: str) -> DataFrame:
    """B22: add_months (month-end clamped identically on both engines),
    last_day, ISO week, weekday (Mon=0), day arithmetic, make_date."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias(
            "next_month"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.weekofyear("o_orderdate").cast("bigint").alias("week_no"),
        F.weekday("o_orderdate").cast("bigint").alias("weekday_no"),
        F.date_format(F.date_add("o_orderdate", 45), "yyyy-MM-dd").alias("plus_45d"),
        F.date_format(
            F.make_date(F.lit(2024), F.month("o_orderdate"), F.lit(1)), "yyyy-MM-dd"
        ).alias("in_2024"),
    )


@query(
    "b24_array_fns2",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_filter(toks, x -> x = 'data')) > 0 AS has_data,
           len(list_filter(toks, x -> length(x) = 0)) = 0 AS all_nonempty,
           CAST(list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b)
                AS BIGINT) AS total_chars,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(list_position(toks, 'data') AS BIGINT) AS data_pos,
           list_max(toks) AS tok_max,
           list_min(toks) AS tok_min
    FROM t
    """,
)
def b24_array_fns2(spark: SparkSession, sf: str) -> DataFrame:
    """B24: higher-order array functions (exists/forall/aggregate) +
    distinct/position/min/max — all JVM-side lambda expressions."""
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    return d.select(
        "doc_id",
        F.exists("toks", lambda x: x == F.lit("data")).alias("has_data"),
        F.forall("toks", lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique"),
        F.array_position("toks", "data").cast("bigint").alias("data_pos"),
        F.array_max("toks").alias("tok_max"),
        F.array_min("toks").alias("tok_min"),
    )


@query(
    "b25_map_fns",
    oracle="""
    WITH t AS (SELECT c_custkey,
                      map(['seg', 'name'], [c_mktsegment, c_name]) AS m
               FROM customer)
    SELECT c_custkey,
           map_extract(m, 'seg')[1] AS seg,
           CAST(cardinality(m) AS BIGINT) AS n_keys,
           array_to_string(map_keys(m), ',') AS keys_csv
    FROM t
    """,
)
def b25_map_fns(spark: SparkSession, sf: str) -> DataFrame:
    """B25: map construction, element access, keys/cardinality."""
    c = load(spark, sf, "customer").withColumn(
        "m",
        F.map_from_arrays(
            F.array(F.lit("seg"), F.lit("name")),
            F.array("c_mktsegment", "c_name"),
        ),
    )
    return c.select(
        "c_custkey",
        F.element_at("m", "seg").alias("seg"),
        F.size("m").cast("bigint").alias("n_keys"),
        F.concat_ws(",", F.map_keys("m")).alias("keys_csv"),
    )


_CORRELATED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
    SELECT 1.5 * AVG(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey)
"""


@query("b28_correlated_subquery", oracle=_CORRELATED_SQL)
def b28_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """B28: correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join — no per-row re-execution). Same SQL both engines."""
    register_views(spark, sf)
    return spark.sql(_CORRELATED_SQL)


_NOT_IN_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (
    SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


@query("b28_not_in_subquery", oracle=_NOT_IN_SQL)
def b28_not_in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """B28: NOT IN subquery (null-aware anti join). Same SQL both engines."""
    register_views(spark, sf)
    return spark.sql(_NOT_IN_SQL)


_SENTIMENT_LEXICON = [
    ("fast", 1),
    ("big", 1),
    ("value", 1),
    ("merge", 1),
    ("slow", -1),
    ("small", -1),
    ("dup", -1),
    ("error", -1),
]


@query(
    "d4_sentiment",
    oracle=f"""
    WITH lex(w, s) AS (VALUES {", ".join(f"('{w}', {s})" for w, s in _SENTIMENT_LEXICON)}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   len(string_split(text, ' ')) AS n FROM documents)
    SELECT t.doc_id,
           CAST(COALESCE(SUM(l.s), 0) AS BIGINT) AS score,
           ROUND(CAST(COALESCE(SUM(l.s), 0) AS DOUBLE) / ANY_VALUE(t.n), 6)
             AS score_norm
    FROM tok t LEFT JOIN lex l ON t.w = l.w
    GROUP BY t.doc_id
    """,
)
def d4_sentiment(spark: SparkSession, sf: str) -> DataFrame:
    """D4: lexicon-join sentiment scoring (broadcast dim join after
    explode; the aggregation shuffles only doc_id)."""
    lex = F.broadcast(
        load(spark, sf, "documents").sparkSession.createDataFrame(
            _SENTIMENT_LEXICON, "w string, s int"
        )
    )
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    tok = d.select(
        "doc_id", F.size("toks").alias("n"), F.explode("toks").alias("w")
    )
    return (
        tok.join(lex, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum("s"), F.lit(0)).cast("bigint").alias("score"),
            F.round(
                F.coalesce(F.sum("s"), F.lit(0)).cast("double") / F.any_value("n"),
                6,
            ).alias("score_norm"),
        )
    )


@query(
    "b27_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS not_a_number,
           TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS roundtrip
    FROM events
    """,
)
def b27_try_cast(spark: SparkSession, sf: str) -> DataFrame:
    """B27: try_cast — NULL on failure instead of error (the building
    block for DLQ-style poison-record routing). The oracle's JSON leg
    carries the b26 round-9 pin: DuckDB json_extract raises on
    malformed input where Spark returns NULL, so it is json_valid-
    guarded."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("not_a_number"),
        F.col("value").cast("string").try_cast("double").alias("roundtrip"),
    )


@query(
    "b16_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate NULLS LAST,
                                                     o_orderkey NULLS LAST,
                                                     o_totalprice NULLS LAST
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND UNBOUNDED FOLLOWING)
             AS second_total
    FROM orders
    """,
)
def b16_nth_value(spark: SparkSession, sf: str) -> DataFrame:
    """B16: nth_value over the full-partition frame. The window order
    carries the VALUE as final tiebreak (the b16_ignore_nulls rule):
    (orderdate, orderkey) is not total under the conflicting-duplicate
    class — two copies of one orderkey with different totalprice made
    ``nth_value(..., 2)`` run-arbitrary, surfaced intermittently once
    the seed-20260819+skew corpus concentrated 30% of orders into one
    mega-customer partition and collision odds exploded."""
    from pyspark.sql import Window

    o = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            F.col("o_orderdate").asc_nulls_last(),
            F.col("o_orderkey").asc_nulls_last(),
            F.col("o_totalprice").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_total"),
    )


@query(
    "b21_regexp_extract",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, '([0-9]+)', 1) AS src_num,
           regexp_extract(text, '(table|join) (\\w+)', 2) AS after_kw,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS novowel_len
    FROM documents
    """,
)
def b21_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """B21: regexp_extract (no-match → '' on both engines) + global
    regexp_replace."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
        F.regexp_extract("text", r"(table|join) (\w+)", 2).alias("after_kw"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("bigint").alias(
            "novowel_len"
        ),
    )


@query(
    "b17_range_frame",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events)
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_30m,
           SUM(cents) OVER w AS sum_30m_cents
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    """,
)
def b17_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """B17+: RANGE (time-interval) window frame — per user, the trailing
    30-minute event count and value sum at each event. RANGE frames
    include every tied order value, so the result is order-insensitive
    without a tiebreaker; epoch seconds are floored identically on both
    engines. Money determinism via the integer-cents protocol (match
    ``tpch.py``): each value becomes BIGINT cents BEFORE the moving sum,
    so the oracle compare is exact regardless of float association.
    One shuffle on user_id + an in-partition sort — the moving
    aggregate itself is O(n) via Spark's sliding frame machinery.
    """
    e = load(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.floor(F.col("ts").cast("double")).cast("long").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-1800, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        F.sum("cents").over(w).alias("sum_30m_cents"),
    )


@query(
    "b17_ts_range_frame",
    oracle="""
    WITH t AS (
      SELECT event_id, event_type, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_id, event_type,
           COUNT(*) OVER w AS n_1d,
           SUM(cents) OVER w AS sum_1d_cents
    FROM t
    WINDOW w AS (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def b17_ts_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """B17+: RANGE frame with INTERVAL bounds over a raw TIMESTAMP
    order key (no epoch-seconds detour — the frame arithmetic runs in
    the engines' native timestamp domain). Round-9 divergence pin from
    the window-frame fuzzer probe: with the SAME unit on both bounds
    Spark and DuckDB agree on every probed combination (ASC/DESC, NULL
    order keys, UNBOUNDED/FOLLOWING mixes); with MIXED units (e.g.
    ``'36' HOUR PRECEDING AND '1' DAY FOLLOWING``) Spark raises
    ``DATATYPE_MISMATCH.SPECIFIED_WINDOW_FRAME_DIFF_TYPES`` at analysis
    while DuckDB executes — the portable recipe is one unit per frame,
    which this query (and the ``q_window_frame`` fuzz generator) uses.
    Money determinism via integer cents before the moving sum. One
    shuffle on the partition key + an in-partition sort."""
    e = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    frame = (
        "OVER (PARTITION BY event_type ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 DAYS PRECEDING AND CURRENT ROW)"
    )
    return e.selectExpr(
        "event_id",
        "event_type",
        f"COUNT(*) {frame} AS n_1d",
        f"SUM(cents) {frame} AS sum_1d_cents",
    )


@query(
    "b34_histogram",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM events
    GROUP BY 1
    """,
)
def b34_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """B34: fixed-width histogram of the event value distribution —
    10 clamped 20-unit buckets with per-bucket count and min/max.
    Pure keyed aggregation: partial map-side combine, 10-row result."""
    e = load(spark, sf, "events")
    bucket = (
        F.least(F.greatest(F.floor(F.col("value") / 20), F.lit(0)), F.lit(9))
        .cast("bigint")
        .alias("bucket")
    )
    return e.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@query(
    "b30_apply_in_arrow",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_c
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def b30_apply_in_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """B30+ (§2.D): grouped ``applyInArrow`` — Spark 4's Arrow-native
    grouped map (no pandas materialization at all: the group arrives as
    a ``pyarrow.Table`` and the UDF computes with ``pyarrow.compute``
    kernels). Per-segment count + integer-cents balance sum; rounding
    uses half-away-from-zero to match both engines' ROUND. One shuffle
    on the group key, zero Python-object rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.round(
                pc.multiply(table["c_acctbal"], pa.scalar(100.0)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        # explicit types: a NULL group key would otherwise infer a
        # null-typed column and fail Spark's Arrow schema check
        # (round-9 dirty corpus)
        return pa.table(
            {
                "c_mktsegment": pa.array(
                    [table["c_mktsegment"][0].as_py()], pa.string()
                ),
                "n": pa.array([table.num_rows], pa.int64()),
                "bal_c": pa.array([pc.sum(cents).as_py()], pa.int64()),
            }
        )

    c = load(spark, sf, "customer").select("c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInArrow(
        summarize, "c_mktsegment string, n bigint, bal_c bigint"
    )


_EQUIDEPTH_BINS = 10


@query(
    "b34_equidepth_histogram",
    oracle=f"""
    WITH t AS (
      SELECT event_id, value,
             NTILE({_EQUIDEPTH_BINS}) OVER (
               ORDER BY value NULLS LAST, event_id NULLS LAST) AS bin
      FROM events)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(MIN(value), 4) AS lo, ROUND(MAX(value), 4) AS hi
    FROM t GROUP BY bin
    """,
)
def b34_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """B34 extension: EXACT equi-depth histogram — {10} bins with equal
    row counts and true [min, max] value bounds per bin. The binning a
    cost optimizer or drift monitor wants (`percentile_approx` bins
    would be rank-approximate and engine-specific, hence not
    oracle-able).

    ntile needs each row's GLOBAL rank — a single-task sort in the
    naive plan. Here the rank comes from ``distrank.two_level_row_number``
    with a constant partition key (the d12 TeraSort shape: range-bucket
    on the value, rank in parallel, add broadcast bucket offsets) and
    ntile is arithmetic on (rank, n): the standard
    first-``n % bins``-bins-get-one-extra rule.
    """
    from event_streamer_spark.operators.distrank import two_level_row_number

    e = (
        load(spark, sf, "events")
        .select("event_id", "value")
        .withColumn("__g", F.lit(0))
    )
    # NULLS LAST pinned on both engines (round-9 dirty corpus; the
    # two-level path's dedicated NULL bucket is LAST-aligned)
    ranked = two_level_row_number(
        e,
        ["__g"],
        [F.col("value").asc_nulls_last(), F.col("event_id").asc_nulls_last()],
        bucket_value="value",
        out_col="rn",
        count_col="n",
        mode="auto",  # size-aware: naive below the local threshold
    )
    # NTILE(b) over n rows: first (n % b) bins have ceil(n/b) rows
    big = F.ceil(F.col("n") / _EQUIDEPTH_BINS).cast("long")
    small = F.floor(F.col("n") / _EQUIDEPTH_BINS).cast("long")
    n_big = (F.col("n") % _EQUIDEPTH_BINS).cast("long")
    cut = n_big * big  # rows covered by the big bins
    bin_col = F.when(
        F.col("rn") <= cut, F.ceil(F.col("rn") / big)
    ).otherwise(n_big + F.ceil((F.col("rn") - cut) / small)).cast("int")
    return (
        ranked.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@query(
    "b14_empty_grand_total",
    oracle="""
    SELECT r_name AS g0,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(r_regionkey) AS BIGINT) AS total
    FROM region WHERE r_regionkey < 0
    GROUP BY GROUPING SETS ((r_name), ())
    """,
)
def b14_empty_grand_total(spark: SparkSession, sf: str) -> DataFrame:
    """B14 regression (found by scripts/fuzz_oracles.py, seed r7b:126):
    ANSI GROUPING SETS containing the grand-total set ``()`` emits ONE
    aggregate row even over EMPTY input (COUNT(*)=0) — DuckDB/Postgres
    comply, but Spark's Expand-based rollup expands zero input rows to
    zero output rows and silently drops the grand total.

    The compliant Spark recipe, pinned here: compute the ``()`` set as a
    separate global ``df.agg`` (which correctly returns one row on empty
    input) and UNION ALL it with the per-key grouping sets. Cost at
    scale: the global agg is a map-side-combined second pass over the
    same scan — two partial aggregations instead of one Expand, no extra
    shuffle width.
    """
    d = load(spark, sf, "region").filter(F.col("r_regionkey") < 0)
    per_key = d.groupBy(F.col("r_name").alias("g0")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("r_regionkey").cast("bigint").alias("total"),
    )
    grand = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("r_regionkey").cast("bigint").alias("total"),
    ).select(F.lit(None).cast("string").alias("g0"), "cnt", "total")
    return per_key.unionByName(grand)


@query(
    "b27_cast_trunc_double",
    oracle="""
    SELECT c_custkey,
           CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_trunc,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor
    FROM customer WHERE c_acctbal < 0
    """,
)
def b27_cast_trunc_double(spark: SparkSession, sf: str) -> DataFrame:
    """B27 regression (direct engine probe, round 7): ``CAST(double AS
    BIGINT)`` TRUNCATES toward zero on Spark but ROUNDS half-away on
    DuckDB — and ``TRY_CAST`` inherits the same split (-2.5 → -2 vs -3).
    The portable recipes, pinned here on the NEGATIVE c_acctbal rows
    where the two diverge hardest: Spark's bare cast ==
    ``CAST(TRUNC(x))`` on DuckDB; ``FLOOR`` before casting is identical
    on both. Oracle authors must never write a bare double→int cast.
    """
    c = load(spark, sf, "customer").filter(F.col("c_acctbal") < 0)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("bigint").alias("bal_trunc"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
    )


@query(
    "b23_sign_bigint",
    oracle="""
    SELECT c_custkey,
           CAST(SIGN(c_acctbal) AS BIGINT) AS bal_sign
    FROM customer
    """,
)
def b23_sign_bigint(spark: SparkSession, sf: str) -> DataFrame:
    """B23 regression (direct engine probe, round 7): ``SIGN(double)``
    returns DOUBLE on Spark (-1.0) but an integer-typed value on DuckDB
    (-1) — equal numerically, hash-divergent through the canonical
    formatter. The portable recipe is an explicit integer cast on BOTH
    sides, pinned here over c_acctbal's mixed-sign values."""
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.signum("c_acctbal").cast("bigint").alias("bal_sign"),
    )


@query(
    "b22_dow_parity",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(DOW FROM CAST(o_orderdate AS DATE)) + 1
                AS BIGINT) AS dow1,
           CAST(EXTRACT(DOY FROM CAST(o_orderdate AS DATE))
                AS BIGINT) AS doy
    FROM orders
    """,
)
def b22_dow_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B22 regression (date probe, round 7): day-of-week NUMBERING
    diverges — Spark's EXTRACT(DOW)/dayofweek() is 1-based with
    Sunday=1, DuckDB/Postgres EXTRACT(DOW) is 0-based with Sunday=0.
    The portable recipe, pinned over every order date: Spark
    ``dayofweek(d)`` == DuckDB ``EXTRACT(DOW) + 1``. Day-of-YEAR
    (DOY) agrees on both engines and rides along as the control."""
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.dayofweek(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("dow1"),
        F.dayofyear(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("doy"),
    )


@query(
    "b21_left_neg_parity",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_name IS NULL THEN NULL
                WHEN c_custkey % 5 - 2 < 0 THEN ''
                ELSE LEFT(c_name, c_custkey % 5 - 2) END AS left_n,
           LEFT(c_name, 3) AS left_3
    FROM customer
    """,
)
def b21_left_neg_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B21 regression (expression probe, round 8): ``LEFT(s, n)`` with
    NEGATIVE n returns '' on Spark but drops the last |n| characters on
    DuckDB (``LEFT('abcdef', -2)`` → '' vs 'abcd'). The portable
    recipe, pinned over per-row varying n ∈ [-2, 2]: guard with
    ``CASE WHEN n < 0 THEN '' ELSE LEFT(s, n) END`` (or
    ``LEFT(s, GREATEST(n, 0))``) — n = 0 agrees ('') on both engines,
    so only the negative branch needs the guard — and the guard must
    check the STRING for NULL first (round-9 dirty corpus: the ''
    branch fires for NULL input on DuckDB where Spark's LEFT
    null-propagates). ``LEFT(s, 3)`` rides along as the
    positive-length control."""
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.expr("LEFT(c_name, CAST(c_custkey % 5 - 2 AS INT))").alias(
            "left_n"
        ),
        F.expr("LEFT(c_name, 3)").alias("left_3"),
    )


@query(
    "b21_substr_zero_parity",
    oracle="""
    SELECT c_custkey,
           SUBSTR(c_name, GREATEST(CAST(c_custkey % 3 AS INT), 1), 4)
             AS sub_n
    FROM customer
    """,
)
def b21_substr_zero_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B21 regression (expression probe, round 8): ``SUBSTR(s, 0, n)``
    — Spark clamps start 0 to position 1 and returns n characters;
    DuckDB treats position 0 as one-before-start and burns part of the
    length window there (``SUBSTR('abcdef', 0, 3)`` → 'abc' vs 'ab').
    Negative starts agree (both count from the end); only 0 splits.
    The portable recipe, pinned over per-row start ∈ {0, 1, 2}:
    ``GREATEST(start, 1)`` on the DuckDB side reproduces Spark's
    clamp exactly."""
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.expr(
            "SUBSTR(c_name, CAST(c_custkey % 3 AS INT), 4)"
        ).alias("sub_n"),
    )


@query(
    "b21_regexp_replace_global",
    oracle=r"""
    SELECT c_custkey,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS masked,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
)
def b21_regexp_replace_global(spark: SparkSession, sf: str) -> DataFrame:
    """B21 regression (expression probe, round 8): ``REGEXP_REPLACE``
    replaces ALL matches on Spark but only the FIRST on DuckDB unless
    the 'g' flag is passed ('a1b2' → 'axbx' vs 'axb2'). The portable
    recipe, pinned over customer names (digit-bearing 'Customer#…'):
    always spell the DuckDB side with the explicit 'g' flag.
    ``REGEXP_EXTRACT`` (group 1, '' on no-match) agrees on both
    engines — probed round 8 — and rides along as the control."""
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@query(
    "b24_array_index_base",
    oracle="""
    SELECT vec_id,
           embedding[1] AS e0,
           CAST(ARRAY_LENGTH(embedding) AS BIGINT) AS alen
    FROM embeddings
    """,
)
def b24_array_index_base(spark: SparkSession, sf: str) -> DataFrame:
    """B24 regression (expression probe, round 8): bracket indexing is
    ZERO-based on Spark (``arr[0]`` = first element) and ONE-based on
    DuckDB (``arr[1]``) — ``[7,8,9][1]`` reads 8 vs 7. The portable
    recipe, pinned over the real FLOAT[] embedding column: Spark
    ``get(arr, i)`` == DuckDB ``arr[i + 1]``. ``get`` rather than
    ``arr[i]`` is a SECOND divergence this pin carries (round-9 dirty
    corpus): out-of-bounds bracket access on an EMPTY array is an ANSI
    ``INVALID_ARRAY_INDEX`` error on Spark but NULL on DuckDB — ``get``
    is Spark's NULL-on-miss spelling. Length spelling also differs —
    ``ARRAY_SIZE`` (Spark) vs ``ARRAY_LENGTH`` (DuckDB) — and rides
    along as the mapped control."""
    return load(spark, sf, "embeddings").select(
        "vec_id",
        F.expr("get(embedding, 0)").alias("e0"),
        F.array_size("embedding").cast("bigint").alias("alen"),
    )


@query(
    "b24_array_distinct_order",
    oracle="""
    SELECT n_nationkey,
           ARRAY_SORT(ARRAY_DISTINCT(
             [n_nationkey % 3, n_nationkey % 5, n_nationkey % 3]
           )) AS dedup_sorted
    FROM nation
    """,
)
def b24_array_distinct_order(spark: SparkSession, sf: str) -> DataFrame:
    """B24 regression (expression probe, round 8): ``ARRAY_DISTINCT``
    preserves first-occurrence order on Spark but returns elements in
    hash order on DuckDB (``[1,2,1]`` → [1,2] vs [2,1]) — same set,
    hash-divergent through the canonical formatter. The portable
    recipe, pinned here: always wrap in ``ARRAY_SORT`` (NULLS LAST on
    BOTH engines, probed round 8) before comparing dedup'd arrays.
    Array construction itself is dialect-split (Spark ``ARRAY(…)`` vs
    DuckDB ``[…]``) — the fuzzer's dialect-mapped renderer handles
    that; oracles here just spell each side natively."""
    k = F.col("n_nationkey")
    return load(spark, sf, "nation").select(
        "n_nationkey",
        F.array_sort(
            F.array_distinct(F.array(k % 3, k % 5, k % 3))
        ).alias("dedup_sorted"),
    )


@query(
    "b23_xor_caret_parity",
    oracle="""
    SELECT n_nationkey,
           CAST(XOR(n_nationkey, 5) AS BIGINT) AS x_xor,
           CAST(n_nationkey & 5 AS BIGINT) AS x_and,
           CAST(n_nationkey | 5 AS BIGINT) AS x_or,
           CAST(n_nationkey << 2 AS BIGINT) AS x_shl,
           CAST(BIT_COUNT(n_nationkey) AS BIGINT) AS x_pop
    FROM nation
    """,
)
def b23_xor_caret_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B23 regression (expression probe, round 8): the ``^`` operator
    is bitwise XOR on Spark but POWER on DuckDB — ``5 ^ 2`` silently
    returns 7 vs 25.0 (different value AND type; no error on either
    side, the worst divergence class). The portable recipe, pinned over
    nation keys: spell XOR as DuckDB's ``XOR(a, b)`` function on the
    oracle side and keep ``^`` on Spark (Spark has no XOR function;
    DuckDB's caret is never XOR). The ``&``, ``|``, ``<<``, ``>>`` and
    ``BIT_COUNT`` spellings agree on both engines and ride along as
    controls."""
    k = F.col("n_nationkey")
    return load(spark, sf, "nation").select(
        "n_nationkey",
        F.expr("n_nationkey ^ 5").cast("bigint").alias("x_xor"),
        k.bitwiseAND(5).cast("bigint").alias("x_and"),
        k.bitwiseOR(5).cast("bigint").alias("x_or"),
        F.shiftleft(k, 2).cast("bigint").alias("x_shl"),
        F.bit_count(k).cast("bigint").alias("x_pop"),
    )


@query(
    "b23_div_zero_parity",
    oracle="""
    SELECT c_custkey,
           ROUND(c_acctbal / NULLIF(CAST(c_custkey % 5 AS DOUBLE), 0.0), 6)
             AS safe_ratio,
           ROUND(c_acctbal / CAST(c_custkey % 5 + 1 AS DOUBLE), 6)
             AS plain_ratio
    FROM customer
    """,
)
def b23_div_zero_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B23 regression (round-9 NaN/edge probe): DOUBLE division by zero
    is an ANSI ``DIVIDE_BY_ZERO`` runtime ERROR on Spark — even for
    floating point, where IEEE says ±Inf — while DuckDB quietly returns
    NULL. One zero denominator aborts a 100 TB Spark scan that DuckDB
    shrugs off. The portable recipe, pinned over a per-row varying
    denominator that hits 0 every 5th row: ``try_divide`` on Spark ↔ a
    bare ``/`` on DuckDB (both NULL on zero), or equivalently
    ``NULLIF(den, 0)`` on both. A never-zero division rides along as
    the control. (Same probe confirmed NaN parity END-TO-END: grouping,
    ordering, MIN/MAX/SUM propagation, and NaN = NaN agree on both
    engines; the only NaN divergence surface is the strict CAST — both
    engines RAISE casting NaN to BIGINT, so NaN money is loudly out of
    the integer-cents domain on both.)"""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.round(
            F.try_divide(
                F.col("c_acctbal"),
                (F.col("c_custkey") % 5).cast("double"),
            ),
            6,
        ).alias("safe_ratio"),
        F.round(
            F.col("c_acctbal") / (F.col("c_custkey") % 5 + 1).cast("double"),
            6,
        ).alias("plain_ratio"),
    )


@query(
    "b23_nan_parity",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN CAST('nan' AS DOUBLE)
                  ELSE c_acctbal END AS v
      FROM customer)
    SELECT CAST(c_custkey % 3 AS BIGINT) AS g,
           COUNT(v) AS n_vals,
           ROUND(MIN(v), 4) AS mn,
           MAX(v) AS mx,
           SUM(CASE WHEN ISNAN(v) THEN 1 ELSE 0 END) AS n_nan
    FROM t GROUP BY 1
    """,
)
def b23_nan_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B23 regression (round-9 probe): NaN behavioral parity, pinned so
    a future engine upgrade that changes NaN totalness breaks the hash.
    Both engines treat NaN as EQUAL to itself, GREATER than every
    number (so it wins MAX and sorts last), COUNTed as a value (not
    NULL), and propagating through SUM — the probed axes. The canonical
    hash serializes NaN as the literal 'NaN' on both sides."""
    c = load(spark, sf, "customer")
    v = F.when(
        F.col("c_custkey") % 7 == 0, F.expr("CAST('nan' AS DOUBLE)")
    ).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", v.alias("v"))
        .groupBy((F.col("c_custkey") % 3).cast("bigint").alias("g"))
        .agg(
            F.count("v").alias("n_vals"),
            F.round(F.min("v"), 4).alias("mn"),
            F.max("v").alias("mx"),
            F.sum(F.when(F.isnan("v"), 1).otherwise(0)).alias("n_nan"),
        )
    )


@query(
    "b22_datediff_unit_parity",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM AGE(CAST(o_orderdate AS DATE),
                                      DATE '1995-06-15')) AS INT)
             AS yr_diff,
           CAST(EXTRACT(YEAR FROM AGE(CAST(o_orderdate AS DATE),
                                      DATE '1995-06-15')) * 12
                + EXTRACT(MONTH FROM AGE(CAST(o_orderdate AS DATE),
                                         DATE '1995-06-15')) AS INT)
             AS mo_diff,
           CAST(DATEDIFF('day', DATE '1995-06-15',
                         CAST(o_orderdate AS DATE)) AS BIGINT) AS day_diff
    FROM orders
    """,
)
def b22_datediff_unit_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B22 regression (FOUND BY the round-8 extended fuzzer, seed
    r8-dev4:46): ``DATEDIFF(YEAR|MONTH, a, b)`` counts COMPLETE elapsed
    periods on Spark ('1995-08-15'→'2001-03-01' = 5 years) but calendar
    BOUNDARY crossings on DuckDB (= 6); DAY agrees (elapsed days both).
    The portable recipe, pinned over every order date against a
    mid-corpus reference (both signs exercised; leap-day edge probed):
    Spark ``DATEDIFF(YEAR, a, b)`` == DuckDB
    ``EXTRACT(YEAR FROM AGE(b, a))`` and months via
    ``year*12 + month`` of the same AGE interval — AGE yields complete
    periods, matching Spark's semantics exactly."""
    d = F.col("o_orderdate").cast("date")
    ref = "DATE '1995-06-15'"
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.expr(f"CAST(DATEDIFF(YEAR, {ref}, CAST(o_orderdate AS DATE))"
               " AS INT)").alias("yr_diff"),
        F.expr(f"CAST(DATEDIFF(MONTH, {ref}, CAST(o_orderdate AS DATE))"
               " AS INT)").alias("mo_diff"),
        F.datediff(d, F.lit("1995-06-15").cast("date"))
        .cast("bigint")
        .alias("day_diff"),
    )


@query(
    "b25_map_extract_parity",
    oracle="""
    SELECT n_nationkey,
           (MAP {'lo': n_nationkey % 7, 'hi': n_nationkey % 3})['lo'][1]
             AS v_lo,
           (MAP {'lo': n_nationkey % 7, 'hi': n_nationkey % 3})['zz'][1]
             AS v_miss,
           (MAP {n_name: n_nationkey})[n_name][1] AS v_dyn,
           CAST(CARDINALITY(
             MAP {'lo': n_nationkey % 7, 'hi': n_nationkey % 3}
           ) AS INT) AS card
    FROM nation
    """,
)
def b25_map_extract_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B25 regression (expression probe, round 8): map extraction is a
    SCALAR on Spark (``m['k']`` → value, missing key → NULL) but a
    LIST on DuckDB 1.x (``m['k']`` → ``[value]``, missing → ``[]``) —
    a silent schema + value divergence through any comparator. The
    portable recipe, pinned over literal, missing, and dynamic
    (column-valued) keys: append DuckDB's 1-based list index —
    ``m['k'][1]`` — which unwraps hit → value, miss → NULL, and NULL
    value → NULL, exactly Spark's bracket semantics (probed all three
    cases). Construction is dialect-split (Spark ``MAP('k', v)`` vs
    DuckDB ``MAP {'k': v}``) and ``CARDINALITY`` agrees on both; both
    engines reject duplicate literal keys at runtime, so generated
    keys must be distinct by construction."""
    k = F.col("n_nationkey")
    m = F.create_map(F.lit("lo"), k % 7, F.lit("hi"), k % 3)
    return load(spark, sf, "nation").select(
        "n_nationkey",
        m["lo"].alias("v_lo"),
        m["zz"].alias("v_miss"),
        F.create_map(F.col("n_name"), k)[F.col("n_name")].alias("v_dyn"),
        F.cardinality(m).cast("int").alias("card"),
    )


@query(
    "b22_timestamp_parity",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(SECOND FROM ts) AS INT) AS sec_i,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_s,
           EPOCH_US(ts) AS epoch_us,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_t,
           STRFTIME(ts, '%Y-%m-%d %H') AS hh
    FROM events
    """,
)
def b22_timestamp_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B22 regression (timestamp probes, round 8): four spelling/type
    divergences over a raw TIMESTAMP column, each with its portable
    recipe pinned per row of ``events.ts`` (itself probed per-row
    hash-equal across engines — both truncate parquet nanos to the
    same micros):

    * ``EXTRACT(SECOND)`` — fractional DECIMAL(8,6) on Spark vs int
      on DuckDB; recipe ``CAST(FLOOR(…) AS INT)`` (no-op on DuckDB).
    * epoch seconds — Spark ``UNIX_TIMESTAMP`` is integral while
      DuckDB ``EPOCH`` is a fractional DOUBLE; recipe
      ``CAST(FLOOR(EPOCH(…)) AS BIGINT)`` (floor == truncation for
      the positive-epoch data here).
    * epoch micros — spelling-mapped ``UNIX_MICROS`` ↔ ``EPOCH_US``.
    * ``DATE_TRUNC('day')`` — TIMESTAMP on Spark vs DATE on DuckDB;
      recipe ``CAST(… AS TIMESTAMP)`` (no-op on Spark).
    * format strings — ``DATE_FORMAT`` pattern letters (``yyyy``,
      ``HH``) ↔ ``STRFTIME`` percent codes (``%Y``, ``%H``)."""
    ts = F.col("ts")
    return load(spark, sf, "events").select(
        "event_id",
        F.floor(F.expr("EXTRACT(SECOND FROM ts)")).cast("int")
        .alias("sec_i"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.unix_micros(ts).alias("epoch_us"),
        F.date_trunc("day", ts).alias("day_t"),
        F.date_format(ts, "yyyy-MM-dd HH").alias("hh"),
    )


@query(
    "b66_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS f,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty,
             l_orderkey, l_linenumber
      FROM lineitem
      WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL),
    c AS (
      SELECT f, cents, qty,
             SUM(qty) OVER (PARTITION BY f
                            ORDER BY cents, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(qty) OVER (PARTITION BY f) AS tw
      FROM w),
    q AS (SELECT f, cents, cum, tw FROM c WHERE 2 * cum >= tw)
    SELECT f AS l_returnflag,
           CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM q GROUP BY f
    """,
)
def b66_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """B66: exact weighted median — the quantity-weighted median unit
    price per return flag: the smallest price whose cumulative
    quantity reaches half the group's total (lower weighted median,
    the deterministic convention; ties in price break on the composite
    line key so the cumulative line is identical on both engines).

    All arithmetic is exact integers (price in cents, quantity
    rounded to units), so the crossing point cannot move with float
    merge order. Shape: one partitioned ordered window per group (no
    global sort — work per partition bounded by the group), one total
    window on the same exchange, then a min-aggregate over the
    qualifying suffix. The plain median (B48) is the qty=1 special
    case; this is its volume-aware sibling (VWAP-style robust center).
    """
    w = (
        load(spark, sf, "lineitem")
        # NULL prices carry no rankable value; left in, their weight
        # shifts the cumulative crossing and their NULL sort position
        # diverges (Spark ASC NULLS FIRST vs DuckDB LAST) — round-9
        # dirty corpus, same exclusion rule as b48's SQL MEDIAN
        .filter(
            (F.col("l_quantity") > 0)
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("f"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    win = (
        Window.partitionBy("f")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("f")
    c = w.select(
        "f",
        "cents",
        F.sum("qty").over(win).alias("cum"),
        F.sum("qty").over(tot).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tw"))
        .groupBy(F.col("f").alias("l_returnflag"))
        .agg(
            F.min("cents").alias("wmedian_cents"),
            F.max("tw").alias("total_weight"),
        )
    )


@query(
    "b23_round_tie_parity",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS num,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS den
      FROM lineitem GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus, num, den,
           CAST(((CAST(10000000 AS HUGEINT) * num) // den + 5) // 10
                AS BIGINT) AS ratio_micro_half_up
    FROM c
    """,
)
def b23_round_tie_parity(spark: SparkSession, sf: str) -> DataFrame:
    """B23 regression (found BY b73_vwap's first draft, round 8):
    ``ROUND(double, s)`` DIVERGES on tie-adjacent quotients. Spark
    rounds the double's SHORTEST DECIMAL REPRESENTATION half-up
    (``BigDecimal.valueOf``), DuckDB rounds a scaled double multiply —
    for 13456305/3200 (exact binary value 4205.095312499999636…,
    shortest repr "4205.0953125") Spark says 4205.095313 and DuckDB
    4205.095312. On plain literals (2.675, 0.0953125) the two
    strategies happen to coincide, which is why the round-7 probes
    declared ROUND portable; only a ratio whose scaled multiply stays
    below the tie exposes the split. The portable recipe, pinned here
    on every lineitem (returnflag, linestatus) notional/volume cell:
    never ROUND a double ratio — keep it rational and round in integer
    arithmetic, ``((10·micro) DIV den + 5) DIV 10`` (exact half-up for
    the non-negative ratios here; negative ratios would need a
    sign-split because DIV truncates toward zero on both engines).
    The 10⁷·num product widens through DECIMAL(38,0)/HUGEINT — the
    review measured num at 5.3·10¹¹ cents per cell at sf0.1, so the
    BIGINT spelling had 1.7× headroom at the gate and overflows at
    sf1 (the ``d15_seasonal_dow`` lesson, applied to its own sibling).
    """
    c = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("num"),
            F.sum(
                F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
            ).cast("bigint").alias("den"),
        )
    )
    return c.select(
        "l_returnflag",
        "l_linestatus",
        "num",
        "den",
        F.expr(
            "CAST(((CAST(10000000 AS DECIMAL(38,0)) * num) DIV den"
            " + 5) DIV 10 AS BIGINT)"
        ).alias("ratio_micro_half_up"),
    )
