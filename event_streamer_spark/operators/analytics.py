"""Event analytics (SURVEY §2 extension): funnels and retention cohorts.

The workloads an event-streaming consumer feeds downstream — conversion
funnels (did the user purchase within N days of signup?) and cohort
retention (of the users who signed up in week W, how many were active
in week W+k?). Both are pure relational compositions: window functions
and keyed joins, no UDFs, no driver state.

Scale posture: everything shuffles on ``user_id`` or the cohort bucket —
high-cardinality, skew bounded by events-per-user; aggregations are
partial before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import fmt_ts, query
from event_streamer_spark.tables import load

_FUNNEL_WINDOW_DAYS = 7


@query(
    "b32_funnel",
    oracle=f"""
    WITH first_signup AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN first_signup s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id)
    SELECT s.user_id,
           strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS first_purchase_ts,
           CAST(p.purchase_ts IS NOT NULL
                AND p.purchase_ts <= s.signup_ts
                    + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
                AS BOOLEAN) AS converted
    FROM first_signup s LEFT JOIN first_purchase p ON s.user_id = p.user_id
    """,
)
def b32_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """B32: two-step conversion funnel — per signed-up user, the first
    purchase at-or-after signup and whether it lands inside the 7-day
    conversion window.

    Two keyed aggregations (first signup, first qualifying purchase) and
    one left join, all partitioned on user_id; min() makes the result
    order-insensitive, and the window predicate is a plain column
    expression. The purchase aggregation joins the signup side first so
    pre-signup purchases never count — same semantics as the oracle's
    correlated MIN.
    """
    e = load(spark, sf, "events")
    first_signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    joined = first_signup.join(first_purchase, "user_id", "left")
    converted = F.col("purchase_ts").isNotNull() & (
        F.col("purchase_ts")
        <= F.col("signup_ts") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAYS")
    )
    return joined.select(
        "user_id",
        fmt_ts("signup_ts", "signup_ts"),
        fmt_ts("purchase_ts", "first_purchase_ts"),
        converted.alias("converted"),
    )


@query(
    "b33_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7) AS BIGINT)
               AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def b33_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """B33: weekly retention cohorts — users bucketed by first-seen week;
    for each (cohort, week-offset) the count of users active that week.

    first-seen is one keyed aggregation; the activity join is on
    user_id (broadcast-eligible cohort side at real scale since it is
    one row per user); the final count groups on the low-cardinality
    (cohort_week, week_offset) pair AFTER a distinct that still carries
    user_id — partial aggregation keeps the exchange small.
    """
    e = load(spark, sf, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


@query(
    "b33_retention_cohorts_salted",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7) AS BIGINT)
               AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def b33_retention_cohorts_salted(spark: SparkSession, sf: str) -> DataFrame:
    """B33 (skew-hardened variant): identical semantics and oracle as
    ``b33_retention_cohorts`` — the hash-gate IS the equivalence proof —
    but every skew-prone stage is salted for hot keys:

    * the events⨝first_seen join goes through ``skew.salted_join`` (a
      celebrity user's rows split across 8 salt buckets instead of one
      hot join partition);
    * the final count groups on low-cardinality (cohort_week,
      week_offset) — hot by definition — so it runs as a two-phase
      aggregate: per-(key, salt) partials from a deterministic
      ``crc32(user_id) % 16`` salt, then the tiny re-aggregate.

    This is the plan shape a 100 TB event log with power-law users
    actually needs; the unsalted variant relies on AQE skew handling.
    """
    from event_streamer_spark.skew import salted_join

    e = load(spark, sf, "events").select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        salted_join(e, first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    partials = (
        activity.withColumn("__salt", F.crc32(F.col("user_id").cast("string")) % 16)
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "__salt",
        )
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partials.groupBy("cohort_week", "week_offset").agg(
        F.sum("__partial").alias("n_active_users")
    )


@query(
    "b72_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             DATEDIFF('day', DATE '1992-01-01', MAX(o_orderdate))
               AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_c
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT monetary_c,
             CAST(NTILE(5) OVER (ORDER BY last_day NULLS LAST,
                                 o_custkey NULLS LAST) AS INTEGER)
               AS r_score,
             CAST(NTILE(5) OVER (ORDER BY n_orders NULLS LAST,
                                 o_custkey NULLS LAST) AS INTEGER)
               AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary_c NULLS LAST,
                                 o_custkey NULLS LAST) AS INTEGER)
               AS m_score
      FROM cust)
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) AS monetary_c_total
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def b72_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """B72: RFM segmentation — the classic customer-value cube. Each
    ordering customer gets quintile scores for Recency (days to their
    last order; 5 = most recent), Frequency (order count; 5 = most
    frequent) and Monetary (lifetime cents; 5 = top spender), then the
    ≤125 segments aggregate to (customer count, total monetary).
    Quintile ties break on the customer key, so the buckets are
    deterministic on both engines (NTILE's first-r-tiles-get-one-extra
    rule is shared, pinned by ``ntile_expr``). Customers with no
    orders have no RFM row by definition.

    Scale: the per-customer aggregate is one map-side-combinable
    shuffle on the customer key; each quintile is a GLOBAL ranking —
    the classic single-task window hazard — so all three scores run
    through distrank in ``auto`` mode (naive below the size threshold,
    two-level bucketed above; the day-offset / count / cents columns
    are the ASC-aligned bucket values). The final segment rollup is a
    125-key aggregate.
    """
    from event_streamer_spark.operators.distrank import (
        ntile_expr,
        two_level_row_number,
    )

    cust = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("last_day"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).cast("bigint").alias("monetary_c"),
        )
        .withColumn("__g", F.lit(0))
    )
    scored = cust
    for metric, score in (
        ("last_day", "r_score"),
        ("n_orders", "f_score"),
        ("monetary_c", "m_score"),
    ):
        # NULLS LAST pinned (round-9 dirty corpus: an undated/
        # unpriced customer must take the top quintile slot on BOTH
        # engines; Spark's ASC default is NULLS FIRST)
        ranked = two_level_row_number(
            scored,
            ["__g"],
            [
                F.col(metric).asc_nulls_last(),
                F.col("o_custkey").asc_nulls_last(),
            ],
            bucket_value=metric,
            out_col="__rn",
            count_col="__n",
            mode="auto",  # size-aware: naive below the local threshold
            # three two-level calls in ONE plan: per-metric slots, or
            # each call's persist evicts the previous at build time and
            # the two-level path (the at-scale pick) runs uncached (r13)
            slot=f"distrank.bucketed.b72_{score}",
        )
        scored = ranked.withColumn(
            score, ntile_expr(F.col("__rn"), F.col("__n"), 5)
        ).drop("__rn", "__n")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("monetary_c").cast("bigint").alias("monetary_c_total"),
        )
    )


@query(
    "b74_funnel_latency",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'
                      THEN EPOCH_US(ts) END) AS s_us,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN EPOCH_US(ts) END) AS p_us
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id),
    conv AS (
      SELECT user_id, (p_us - s_us) // 1000000 AS latency_s
      FROM per_user
      WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us > s_us),
    r AS (
      SELECT latency_s,
             ROW_NUMBER() OVER (ORDER BY latency_s, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv)
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MIN(CASE WHEN rn = GREATEST(1, (25 * n + 99) // 100)
                    THEN latency_s END) AS BIGINT) AS p25_s,
           CAST(MIN(CASE WHEN rn = GREATEST(1, (50 * n + 99) // 100)
                    THEN latency_s END) AS BIGINT) AS p50_s,
           CAST(MIN(CASE WHEN rn = GREATEST(1, (75 * n + 99) // 100)
                    THEN latency_s END) AS BIGINT) AS p75_s,
           CAST(MIN(CASE WHEN rn = GREATEST(1, (90 * n + 99) // 100)
                    THEN latency_s END) AS BIGINT) AS p90_s
    FROM r
    """,
)
def b74_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    """B74: funnel conversion-latency percentiles — for every user
    whose first purchase follows their first signup, the
    signup→purchase latency in whole seconds, summarized at the exact
    p25/p50/p75/p90 by the explicit integer rank max(1, ⌈p·n⌉) over
    the (latency, user) total order (the ``d7_winsorize`` percentile
    protocol — engine quantile builtins are not oracle-able). Epoch
    arithmetic uses the pinned ``UNIX_MICROS ↔ EPOCH_US`` spelling;
    the seconds division is the DIV/``//`` truncation pair (latencies
    are positive by the ``p_us > s_us`` filter).

    Scale: one map-side-combinable shuffle on the user key builds the
    per-user funnel endpoints; the converted-user frame is
    user-bounded (never event-sized); its global rank runs through
    distrank ``auto``; the four boundary rows collapse to a 1-row
    summary via conditional aggregation (no second pass).
    """
    from event_streamer_spark.operators.distrank import (
        two_level_row_number,
    )

    per_user = (
        load(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == "signup",
                    F.expr("UNIX_MICROS(ts)"),
                )
            ).alias("s_us"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("UNIX_MICROS(ts)"),
                )
            ).alias("p_us"),
        )
    )
    conv = (
        per_user.filter(
            F.col("s_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") > F.col("s_us"))
        )
        .select(
            "user_id",
            F.expr("(p_us - s_us) DIV 1000000").alias("latency_s"),
        )
        .withColumn("__g", F.lit(0))
    )
    ranked = two_level_row_number(
        conv,
        ["__g"],
        ["latency_s", "user_id"],
        bucket_value="latency_s",
        out_col="rn",
        count_col="n",
        mode="auto",  # size-aware: naive below the local threshold
    )

    def at(p: int):
        rank = F.greatest(F.lit(1), F.expr(f"({p} * n + 99) DIV 100"))
        return F.min(
            F.when(F.col("rn") == rank, F.col("latency_s"))
        ).cast("bigint").alias(f"p{p}_s")

    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        at(25),
        at(50),
        at(75),
        at(90),
    )
