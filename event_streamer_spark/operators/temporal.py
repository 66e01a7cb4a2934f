"""Temporal joins (SURVEY §2.B extension): as-of join over event streams.

The reference has no joins at all; an as-of join is table stakes for
event analytics (the "most recent dimension row at event time" lookup).
Spark lacks a native ASOF JOIN, so it is composed from a union + window
forward-fill — the standard O(n log n) formulation (one shuffle on the
join key, one sort within partitions) rather than an O(n·m) range
self-join. DuckDB's native ``ASOF JOIN`` is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import fmt_ts, query
from event_streamer_spark.tables import load


@query(
    "b31_asof_join",
    oracle="""
    WITH s AS (
      SELECT DISTINCT user_id, ts FROM events
      WHERE event_type = 'signup'
        AND user_id IS NOT NULL AND ts IS NOT NULL),
    p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
        AND user_id IS NOT NULL AND ts IS NOT NULL)
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           p.value AS value
    FROM p ASOF JOIN s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def b31_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """B31: as-of join — each purchase matched to the user's most recent
    signup at-or-before the purchase time (inner semantics: purchases
    with no prior signup drop).

    Plan: union both sides tagged, one shuffle + sort on
    (user_id, ts, side), then ``last(signup_ts, ignorenulls=True)``
    forward-fills the running signup time — at equal timestamps the
    signup sorts first so ``ts >= s.ts`` includes exact ties, matching
    DuckDB ASOF semantics. O(n log n) per key, no range self-join, no
    driver state; skew is bounded by events-per-user.

    Domain (round-9 dirty corpus): NULL keys and NULL timestamps are
    excluded on BOTH engines — left implicit, they are a genuine
    divergence (DuckDB's ASOF matches a NULL-ts probe to the key's
    LATEST quote, while Spark's window fill groups NULL keys into one
    partition and matches them to each other).
    """
    e = load(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    signups = (
        e.filter(F.col("event_type") == "signup")
        .select("user_id", "ts")
        .distinct()
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("ts").alias("s_ts"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("s_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        signups.unionByName(purchases)
        .withColumn("last_signup", F.last("s_ts", ignorenulls=True).over(w))
    )
    return (
        filled.filter((F.col("side") == 1) & F.col("last_signup").isNotNull())
        .select(
            "event_id",
            "user_id",
            fmt_ts("ts", "purchase_ts"),
            fmt_ts("last_signup", "signup_ts"),
            "value",
        )
    )


@query(
    "b45_latest_per_key",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC NULLS LAST,
                                         event_id DESC NULLS LAST,
                                         value DESC NULLS LAST,
                                         event_type DESC NULLS LAST) AS rn
      FROM events)
    SELECT event_id, user_id, event_type, ROUND(value, 4) AS value
    FROM r WHERE rn = 1
    """,
)
def b45_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """B45: latest-record-per-key (CDC upsert compaction / QUALIFY
    pattern) — each user's most recent event, ties broken by event_id.

    Scale: one shuffle on the HIGH-cardinality user_id; every partition
    sorts only that user's events, so there is no low-cardinality
    straggler (the case needing ``distrank``). At 100 TB this is the
    standard changelog→snapshot compaction.

    Tiebreak (r12, sf1-grain hostile seed 20260901): (ts, event_id)
    alone is NOT a total order on a CDC changelog — conflicting
    duplicates (one event_id, two payloads) made each engine keep an
    arbitrary survivor. The ordering now extends through (value,
    event_type), all DESC NULLS LAST on both engines; rows tying on
    the FULL tuple are output-identical, so the winner is determined.
    """
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc_nulls_last("ts"),
        F.desc_nulls_last("event_id"),
        F.desc_nulls_last("value"),
        F.desc_nulls_last("event_type"),
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id", "event_type",
            F.round("value", 4).alias("value"),
        )
    )


@query(
    "b46_scd2",
    oracle="""
    SELECT user_id,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts NULLS LAST,
                                             event_id NULLS LAST),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(LEAD(ts) OVER (PARTITION BY user_id
                               ORDER BY ts NULLS LAST,
                                        event_id NULLS LAST)
                IS NULL AS BOOLEAN) AS is_current
    FROM events
    """,
)
def b46_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """B46: SCD type-2 interval construction — each change record gets a
    ``[valid_from, valid_to)`` interval from its successor's timestamp;
    the open-ended latest row is flagged current. LEAD over the
    high-cardinality user key; deterministic (ts, event_id) ordering,
    NULLS LAST pinned on both engines (round-9 dirty corpus: implicit
    ASC defaults diverge, shifting every successor in a partition with
    an undated change record).
    """
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        fmt_ts("ts", "valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_BIN_SECONDS = 3600  # interval-join bin width (1 h)


@query(
    "b09_interval_join",
    oracle=f"""
    WITH a AS (
      SELECT event_id AS a_id, user_id,
             epoch_us(ts) // 1000000 AS a_start,
             epoch_us(ts) // 1000000 + CAST(FLOOR(value) AS BIGINT) * 60 AS a_end
      FROM events
      WHERE event_type = 'purchase' AND value >= 0 AND value <= 1440),
    b AS (
      SELECT event_id AS b_id, user_id,
             epoch_us(ts) // 1000000 AS b_start,
             epoch_us(ts) // 1000000 + 3600 AS b_end
      FROM events WHERE event_type = 'error')
    SELECT a.a_id, b.b_id, a.user_id,
           CAST(LEAST(a.a_end, b.b_end) - GREATEST(a.a_start, b.b_start)
                AS BIGINT) AS overlap_s
    FROM a JOIN b
      ON a.user_id = b.user_id
     AND a.a_start < b.b_end
     AND b.b_start < a.a_end
    """,
)
def b09_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """B9 extension: interval-OVERLAP join (purchase activity windows ×
    error windows per user) via time binning — the genomics/IP-range
    pattern that keeps a non-equi interval join off the
    BroadcastNestedLoop path.

    Purchase windows run value minutes (≤ ~8 h), error windows 1 h.
    Each interval explodes to the 1-hour bins it touches (bounded by
    len/bin + 1 — ≤9 here), the join runs as an EQUI join on
    (user_id, bin), and
    the true overlap predicate filters residually; dropDuplicates
    removes the double-count when a pair overlaps across a bin
    boundary. Every stage shuffles on the uniform composite key — at
    100 TB the naive range join is a per-user cross product, this is
    scan + one hash join.
    """
    ev = load(spark, sf, "events")
    # duration domain: purchase windows are value MINUTES, declared
    # 0..1440 (24 h) on BOTH engines — the round-10 sf0.01 hostile
    # corpus injects 1e18-magnitude values whose bin enumeration would
    # be unbounded (and NaN, which BETWEEN excludes identically:
    # NaN <= x is false on both engines)
    a = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= 0)
        & (F.col("value") <= 1440)
    ).select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.unix_timestamp("ts").alias("a_start"),
        # floor (not cast-truncate) so negative durations would round the
        # same way the FLOOR() oracle does; fixture values are >0 but the
        # semantics shouldn't depend on that
        (
            F.unix_timestamp("ts") + F.floor("value").cast("bigint") * 60
        ).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"),
        "user_id",
        F.unix_timestamp("ts").alias("b_start"),
        (F.unix_timestamp("ts") + 3600).alias("b_end"),
    )

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        # FLOOR division, not DIV: pre-1970 timestamps have NEGATIVE
        # epochs, and truncating DIV rounds them toward zero — two
        # overlapping intervals near the negative boundary then land
        # in disjoint bin sets and the pair is silently lost (round-10
        # sf0.01 hostile corpus, seed 20260819, 1900-01-01 rows). The
        # pmod identity keeps the arithmetic exact in longs (a double
        # floor() would lose ulps at hostile magnitudes).
        def fdiv(x: str) -> str:
            b = _BIN_SECONDS
            return f"(({x}) - ((({x}) % {b} + {b}) % {b})) DIV {b}"

        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.expr(fdiv(start)),
                    # end is EXCLUSIVE (a_start < b_end residual below):
                    # an interval ending exactly on a bin boundary does
                    # not touch the next bin
                    F.expr(fdiv(f"{end} - 1")),
                )
            ),
        )

    # copy numbers make the bin-boundary dedup MULTISET-correct when
    # event_id is not unique (round-10 sf0.01 hostile corpus:
    # conflicting duplicate purchase rows produce two distinct
    # intervals whose pair rows the old (a_id, b_id) dedup collapsed
    # to one, while the oracle's plain join keeps both). Numbering is
    # per id ORDERED BY the interval payload: differing copies get
    # distinct numbers deterministically; identical copies tie and the
    # arbitrary assignment among identical rows cannot affect the
    # output multiset.
    from pyspark.sql import Window

    wa = Window.partitionBy("a_id").orderBy("user_id", "a_start", "a_end")
    wb = Window.partitionBy("b_id").orderBy("user_id", "b_start", "b_end")
    a = a.withColumn("a_cn", F.row_number().over(wa))
    b = b.withColumn("b_cn", F.row_number().over(wb))
    pairs = (
        binned(a, "a_start", "a_end")
        .join(binned(b, "b_start", "b_end"), ["user_id", "bin"])
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .dropDuplicates(["a_id", "a_cn", "b_id", "b_cn"])
    )
    return pairs.select(
        "a_id",
        "b_id",
        "user_id",
        (
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).cast("bigint").alias("overlap_s"),
    )
