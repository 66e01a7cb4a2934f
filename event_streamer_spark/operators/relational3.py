"""Batch relational surface, part 3: B67–B70 — unpivot, lateral join,
gaps-and-islands, and time-grid interpolation gap-fill.

Round-8 widening beyond SURVEY §2's enumerated ids: these are the four
reporting/reshaping staples a reference user coming from a SQL warehouse
reaches for next (wide→long reshape, per-row correlated top-N, streak
detection, time-series resampling). Reference parity note: the reference
(comparaonline/event-streamer) has no relational surface at all
(`src/` is a KafkaJS routing wrapper); these extend the §2.B mandate.

Engine-difference ledger for this module (same contract as
``scripts/fuzz_oracles.py``'s module docstring):

- UNPIVOT null rows: Spark ``DataFrame.unpivot`` KEEPS null measure
  values, DuckDB's ``UNPIVOT`` EXCLUDES them by default — the Spark leg
  filters ``val IS NOT NULL`` explicitly so both engines compute the
  exclude-nulls semantics.
- ``DIV``/``//`` integer division TRUNCATES toward zero on BOTH engines
  (probed by the ``q_intdiv`` fuzz shape), so interpolation deltas may
  be negative without a floor/trunc divergence.
- ``datediff(end, start)`` (Spark, 2-arg) ↔ ``DATEDIFF('day', start,
  end)`` (DuckDB, 3-arg): note the REVERSED argument order.
- ``sequence(lo, hi)`` on dates steps 1 day (Spark) ↔
  ``unnest(generate_series(lo, hi, INTERVAL '1 day'))`` (DuckDB).
- ``LAST_VALUE(x) IGNORE NULLS`` (Spark postfix) ↔
  ``LAST_VALUE(x IGNORE NULLS)`` (DuckDB in-call), as pinned by
  ``b16_ignore_nulls``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load, register_views


@query(
    "b67_unpivot",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity*100) AS BIGINT)      AS qty_c,
             CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount*100) AS BIGINT)      AS disc_c,
             CAST(ROUND(l_tax*100) AS BIGINT)           AS tax_c
      FROM lineitem)
    SELECT l_returnflag, measure,
           CAST(SUM(val) AS BIGINT) AS total_c,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(val) AS BIGINT) AS max_c
    FROM (UNPIVOT c ON qty_c, price_c, disc_c, tax_c
          INTO NAME measure VALUE val)
    GROUP BY l_returnflag, measure
    """,
)
def b67_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """B67: UNPIVOT (wide→long reshape) — melt the four lineitem money
    measures into (measure, value) rows, then aggregate per
    (returnflag, measure). Money goes through the integer-cents
    protocol BEFORE the reshape so the long-format SUM is exact and
    associative on both engines.

    Spark's ``DataFrame.unpivot`` compiles to a single Expand node — a
    narrow map-side row multiplication (no shuffle until the final
    aggregate), so the reshape itself costs one pass at any scale; the
    aggregate shuffles on (returnflag, measure), a 12-key space. NULL
    measure values are filtered explicitly because DuckDB's UNPIVOT
    excludes them while Spark keeps them (module ledger).
    """
    li = load(spark, sf, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_quantity*100) AS BIGINT)").alias("qty_c"),
        F.expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)").alias("price_c"),
        F.expr("CAST(ROUND(l_discount*100) AS BIGINT)").alias("disc_c"),
        F.expr("CAST(ROUND(l_tax*100) AS BIGINT)").alias("tax_c"),
    )
    long = li.unpivot(
        ["l_returnflag"],
        ["qty_c", "price_c", "disc_c", "tax_c"],
        "measure",
        "val",
    ).filter(F.col("val").isNotNull())
    return long.groupBy("l_returnflag", "measure").agg(
        F.sum("val").cast("bigint").alias("total_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max("val").cast("bigint").alias("max_c"),
    )


@query(
    "b68_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n
    CROSS JOIN LATERAL (
      SELECT c_name, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name NULLS LAST
      LIMIT 3) t
    """,
)
def b68_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """B68: LATERAL join (correlated top-N per outer row) — each
    nation's three highest-balance customers via a correlated
    ``JOIN LATERAL (... ORDER BY ... LIMIT 3)`` subquery (Spark 4
    lateral subquery decorrelation).

    Catalyst DECORRELATES the lateral: the plan is a window
    rank-filter over one customer shuffle partitioned by nationkey —
    not N per-nation scans — so it scales as one pass over the fact
    side regardless of outer-row count. Tie-break on (acctbal DESC,
    name NULLS LAST) — explicit on BOTH engines since the r12
    sf1-grain hostile replay (seed 20260901): an injected NULL c_name
    at an acctbal tie on the LIMIT-3 boundary sorted NULLS FIRST under
    Spark's bare-ASC default but NULLS LAST under DuckDB's. Rows tying
    on the full (acctbal, name) pair are output-identical, so the cut
    is determined. acctbal passes through unchanged (same parquet
    double on both engines, no arithmetic).
    """
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name NULLS LAST
          LIMIT 3) t
        """
    )


@query(
    "b69_gaps_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    r AS (
      SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d)
    SELECT user_id,
           MIN(day) AS streak_start,
           MAX(day) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM r
    GROUP BY user_id, day - CAST(rn AS INTEGER)
    """,
)
def b69_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """B69: gaps-and-islands — each user's maximal runs of CONSECUTIVE
    active days (the streak/retention staple). The classic anchor
    trick: within a user, ``day − row_number`` is constant exactly on
    a consecutive run, so grouping by it splits islands with one
    window + one aggregate.

    Scale: one shuffle for the per-user distinct-day dedup + window
    (same user partitioning reused by both — Catalyst collapses them
    into a single exchange), one map-combinable aggregate on
    (user, anchor). Per-user day counts are calendar-bounded, so no
    partition can exceed ~years×365 rows — skew-safe by construction.
    NULL ts/user rows are filtered identically on both sides (the
    ordered-window NULL-placement gotcha this repo pins in every
    windowed query).
    """
    e = (
        load(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    anchored = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.expr("date_sub(day, CAST(rn AS INT))"))
    )
    return anchored.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
    ).drop("anchor")


@query(
    "b70_gap_fill_interp",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS cnt
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2),
    span AS (SELECT pri, MIN(day) AS lo, MAX(day) AS hi FROM obs GROUP BY pri),
    grid AS (
      SELECT pri,
             CAST(unnest(generate_series(lo, hi, INTERVAL '1 day')) AS DATE)
               AS day
      FROM span),
    j AS (
      SELECT g.pri, g.day, o.cnt
      FROM grid g LEFT JOIN obs o ON g.pri = o.pri AND g.day = o.day),
    w AS (
      SELECT pri, day, cnt,
        LAST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS)
          OVER wp AS pd,
        LAST_VALUE(cnt IGNORE NULLS) OVER wp AS pv,
        FIRST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS)
          OVER wf AS nd,
        FIRST_VALUE(cnt IGNORE NULLS) OVER wf AS nv
      FROM j
      WINDOW wp AS (PARTITION BY pri ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY pri ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT pri, day,
           CAST(CASE
             WHEN cnt IS NOT NULL THEN cnt * 1000
             WHEN pv IS NULL THEN nv * 1000
             WHEN nv IS NULL THEN pv * 1000
             ELSE pv * 1000
                  + ((nv - pv) * 1000 * DATEDIFF('day', pd, day))
                    // DATEDIFF('day', pd, nd)
           END AS BIGINT) AS interp_milli,
           CAST(cnt IS NOT NULL AS BIGINT) AS observed
    FROM w
    """,
)
def b70_gap_fill_interp(spark: SparkSession, sf: str) -> DataFrame:
    """B70: time-grid gap-fill with LINEAR INTERPOLATION — resample
    each order-priority's daily order-count series onto a dense daily
    grid over its own observed span, filling missing days by linear
    interpolation between the previous and next observations
    (×1000 fixed-point; ``DIV``/``//`` truncate identically on both
    engines, module ledger, so the result is bit-exact).

    The missing-neighbor CASE arms (pv/nv NULL) are unreachable here —
    the grid spans min..max per key, so every gap is interior — but
    both engines carry them so a span change cannot silently diverge.

    Scale: the grid is ``sequence()``-exploded per key (calendar-
    bounded rows per key, no driver loop); prev/next carries are two
    unbounded running windows over the SAME (pri, day) sort — one
    shuffle, both window frames computed in a single pass each
    direction. This is the Spark-native spelling of a time-series
    ``resample().interpolate()``: no self-join, no per-gap subquery.
    """
    register_views(spark, sf)
    return spark.sql(
        """
        WITH obs AS (
          SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
                 COUNT(*) AS cnt
          FROM orders WHERE o_orderdate IS NOT NULL
          GROUP BY 1, 2),
        span AS (
          SELECT pri, MIN(day) AS lo, MAX(day) AS hi FROM obs GROUP BY pri),
        grid AS (SELECT pri, explode(sequence(lo, hi)) AS day FROM span),
        j AS (
          SELECT g.pri, g.day, o.cnt
          FROM grid g LEFT JOIN obs o ON g.pri = o.pri AND g.day = o.day),
        w AS (
          SELECT pri, day, cnt,
            LAST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END) IGNORE NULLS
              OVER wp AS pd,
            LAST_VALUE(cnt) IGNORE NULLS OVER wp AS pv,
            FIRST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END) IGNORE NULLS
              OVER wf AS nd,
            FIRST_VALUE(cnt) IGNORE NULLS OVER wf AS nv
          FROM j
          WINDOW wp AS (PARTITION BY pri ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY pri ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT pri, day,
               CAST(CASE
                 WHEN cnt IS NOT NULL THEN cnt * 1000
                 WHEN pv IS NULL THEN nv * 1000
                 WHEN nv IS NULL THEN pv * 1000
                 ELSE pv * 1000
                      + ((nv - pv) * 1000 * datediff(day, pd))
                        DIV datediff(nd, pd)
               END AS BIGINT) AS interp_milli,
               CAST(cnt IS NOT NULL AS BIGINT) AS observed
        FROM w
        """
    )


@query(
    "b71_skyline",
    oracle="""
    WITH c AS (
      SELECT p_partkey, p_size,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
      FROM part
      WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL)
    SELECT p.p_partkey, p.p_size, p.price_c
    FROM c p
    WHERE NOT EXISTS (
      SELECT 1 FROM c q
      WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
        AND (q.price_c < p.price_c OR q.p_size > p.p_size))
    """,
)
def b71_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """B71: skyline / Pareto frontier (Börzsönyi et al., ICDE'01) —
    the parts no other part strictly dominates on (lower price, larger
    size): q dominates p iff q.price ≤ p.price ∧ q.size ≥ p.size with
    at least one strict. Duplicated frontier points all survive (no
    strict part in the dominance test), which the oracle's NOT EXISTS
    states directly.

    The naive plan is the O(n²) dominance anti-join the oracle runs —
    fine for DuckDB on a fixture, fatal at 100 TB. The Spark leg uses
    the dimensional reduction instead: for 2-D dominance only the
    cheapest price AT EACH SIZE can be on the frontier, so
    ``groupBy(size).min(price)`` (one map-side-combinable shuffle on a
    key space bounded by the size DOMAIN — 50 values here, never the
    row count) collapses the input to ≤|domain| candidates. A
    candidate survives iff no LARGER size has min-price ≤ its own —
    one suffix-min window over the ≤50-row frame (the single-partition
    window is bounded by the domain, not the data; for an unbounded
    y-domain this step moves to distrank's two-level machinery). The
    surviving frontier broadcasts back onto the base table to recover
    every tied part row, so the only data-sized operations are one
    50-key aggregate and one broadcast-hash semi-recovery join.
    """
    from pyspark.sql import Window

    # NULL dimensions are excluded explicitly on BOTH engines: a
    # NULL-size row satisfies no dominance predicate, so DuckDB's NOT
    # EXISTS would put it IN the skyline while the Spark recovery
    # join's NULL-unequal semantics would drop it
    base = (
        load(spark, sf, "part")
        .filter(
            F.col("p_size").isNotNull()
            & F.col("p_retailprice").isNotNull()
        )
        .select(
            "p_partkey",
            "p_size",
            F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias(
                "price_c"
            ),
        )
    )
    per_size = base.groupBy("p_size").agg(F.min("price_c").alias("m"))
    # suffix min over strictly larger sizes (domain-bounded frame)
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        per_size.withColumn("suf", F.min("m").over(w))
        .filter(F.col("suf").isNull() | (F.col("m") < F.col("suf")))
        .select("p_size", F.col("m").alias("price_c"))
    )
    return base.join(F.broadcast(frontier), ["p_size", "price_c"]).select(
        "p_partkey", "p_size", "price_c"
    )


@query(
    "b73_vwap",
    oracle="""
    WITH c AS (
      SELECT p.p_brand,
             DATE_TRUNC('month', CAST(l.l_shipdate AS DATE)) AS month,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l.l_quantity * 100) AS BIGINT)      AS qty_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL)
    SELECT p_brand,
           STRFTIME(month, '%Y-%m') AS month,
           CAST(SUM(price_c) AS BIGINT) AS notional_c,
           CAST(SUM(qty_c) AS BIGINT)   AS volume_c,
           CAST((1000000 * CAST(SUM(price_c) AS HUGEINT))
             // NULLIF(CAST(SUM(qty_c) AS BIGINT), 0) AS BIGINT)
             AS vwap_micro
    FROM c
    GROUP BY p_brand, month
    """,
)
def b73_vwap(spark: SparkSession, sf: str) -> DataFrame:
    """B73: volume-weighted average price per (brand, ship month) —
    the TWAP/VWAP rollup every trading/pricing pipeline runs. VWAP =
    Σ(notional)/Σ(volume); both sums stay in the integer-cents
    protocol and the per-unit price is an exact integer micro-ratio
    under the DIV parity — a first draft emitted ROUND(double, 6) and
    the fixture immediately found an exact …31250 tie at the 6th
    decimal where Spark rounds HALF_UP and DuckDB half-even (the
    round-tie divergence the integer protocol exists to avoid; 10^6 ·
    notional needs DECIMAL(38,0) beyond ~10^12-cent cells). NULL ship
    dates are excluded explicitly on both engines (dirty-fixture rows
    carry them; module ledger's b67 lesson).

    Scale: the classic fact-dim equi-join — lineitem ⨝ part on the
    part key (dimension side prunable to (partkey, brand), broadcast
    when it fits, shuffle otherwise — left to AQE), then ONE
    map-side-combinable aggregate on (brand, month), a
    25-brands × ~84-months key space. Month-string formatting is the
    pinned ``date_format ↔ STRFTIME`` dialect pair from
    ``b22_timestamp_parity``.
    """
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.date_format(
                F.date_trunc("month", F.col("l_shipdate").cast("date")),
                "yyyy-MM",
            ).alias("month"),
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
                "price_c"
            ),
            F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)").alias(
                "qty_c"
            ),
        )
        .groupBy("p_brand", "month")
        .agg(
            F.sum("price_c").cast("bigint").alias("notional_c"),
            F.sum("qty_c").cast("bigint").alias("volume_c"),
        )
        .select(
            "p_brand",
            "month",
            "notional_c",
            "volume_c",
            # DECIMAL(38,0) widening + zero-volume guard (round-9
            # seeded dirty corpus: a 9.9e11 price makes 10^6·notional
            # overflow BIGINT — Spark ANSI aborts the job while DuckDB
            # widens to HUGEINT; and an injected 0.0-quantity group
            # made both engines raise on the division) — the
            # d17_hits DECIMAL-DIV-HUGEINT parity recipe
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * notional_c)"
                " DIV NULLIF(volume_c, 0) AS BIGINT)"
            ).alias("vwap_micro"),
        )
    )
