"""Time-window aggregations (SURVEY §2.C C1-C3, C5) — batch-evaluable.

``window()`` / ``session_window()`` are the same expressions Structured
Streaming uses; running them over the batch ``events`` table lets the
DuckDB oracle hash-check the exact window semantics that the streaming
path (``event_streamer_spark.streaming``) reuses verbatim.

Float note: ``value`` is a full-precision double, so sums are rounded to
4 decimals on both sides — per-window partial-sum reordering perturbs
~1e-13, far below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load


@query(
    "c1_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
)
def c1_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """C1: tumbling 1-hour window (epoch-aligned, same as date_trunc).
    NULL timestamps belong to no window: Spark's ``window()`` drops
    them silently, so the exclusion is made explicit on both engines
    (round-9 dirty corpus)."""
    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # integer-cents sum (round-9 dirty seed 777: ROUND(SUM
            # (double), 4) is merge-order-sensitive past 1e15, where
            # a double's ulp is 0.125 — the money protocol's exact
            # cents make the total order-independent)
            (
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("double")
                / 100
            ).alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "total",
        )
    )


@query(
    "c2_sliding_window",
    oracle="""
    WITH s AS (SELECT value, CAST(floor(epoch(ts)/1800)*1800 AS BIGINT) AS b
               FROM events WHERE ts IS NOT NULL),
    w AS (SELECT b AS ws, value FROM s UNION ALL SELECT b - 1800 AS ws, value FROM s)
    SELECT strftime(make_timestamp(ws*1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM w GROUP BY ws
    """,
)
def c2_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """C2: sliding window (1 hour length, 30 min slide) — each event lands
    in exactly 2 windows; oracle materializes the two shifted buckets.
    NULL timestamps excluded explicitly on both engines (c1 note)."""
    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # integer-cents sum (round-9 dirty seed 777: ROUND(SUM
            # (double), 4) is merge-order-sensitive past 1e15, where
            # a double's ulp is 0.125 — the money protocol's exact
            # cents make the total order-independent)
            (
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("double")
                / 100
            ).alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "total",
        )
    )


@query(
    "c3_session_window",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s,
             -- rno anchors the running sum to the SAME tie order the
             -- lag saw (both ride window w, one pass): ordering the
             -- sum by (ts, event_id) re-sorts, and exact-duplicate
             -- rows (dirty corpora) can land on the other side of the
             -- new_s flag, splitting a session nondeterministically
             -- (r14: sf1-dirty seed 20260901 flipped counts between
             -- runs; Spark's setwise session_window has no such order
             -- dependence)
             ROW_NUMBER() OVER w AS rno
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, event_id NULLS LAST)),
    g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY rno
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS cnt
    FROM g GROUP BY user_id, sid
    """,
)
def c3_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """C3: session windows with a 5-minute gap per user — the oracle is the
    classic gaps-and-islands rewrite. A new session starts when the gap is
    >= the timeout (matches Spark's half-open [start, start+gap) merge).
    NULL timestamps excluded explicitly on both engines (c1 note);
    NULL event_id tiebreaks pinned LAST."""
    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "cnt",
        )
    )


# c4 batch leg: arrival order is event_id (the generator's append
# order — the batch-evaluable proxy for micro-batch arrival), delay is
# 10 minutes, and the watermark seen by a row is the max event time
# STRICTLY before it in arrival order minus the delay — the finest-
# grain (per-row) reading of Structured Streaming's watermark update.
_C4_DELAY = "INTERVAL 10 MINUTES"
_C4_BUCKET = 8192


@query(
    "c4_late_drop",
    oracle="""
    WITH e AS (SELECT event_id, ts, event_type
               FROM events WHERE ts IS NOT NULL),
    m AS (
      SELECT event_type, ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS wm_src
      FROM e)
    SELECT event_type,
           CAST(SUM(CASE WHEN wm_src IS NOT NULL
                          AND ts < wm_src - INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN wm_src IS NULL
                          OR ts >= wm_src - INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
    FROM m GROUP BY event_type
    """,
)
def c4_late_drop(spark: SparkSession, sf: str) -> DataFrame:
    """C4: watermark late-drop semantics, batch-evaluable (r13, VERDICT
    #6 — the one §2.C row that had tests but no registry entry; the
    streaming execution leg stays ``tests/test_streaming.py``).

    An event is LATE iff its event time is more than 10 minutes behind
    the maximum event time among events that arrived before it
    (arrival order = ``event_id``); the result is per-type late/on-time
    counts, non-vacuous at clean grains (n_late = 0 there but the
    on-time census still hashes) and sharply non-trivial at hostile
    grains (a planted year-2262 timestamp makes every later arrival
    late; re-keyed content dups arrive last with early event times).

    Scale shape: the oracle's single global running-max window would be
    one task sorting the whole fact at 100 TB, so the Spark leg runs
    the same two-level decomposition as distrank — per-bucket max
    (map-combinable groupBy on ``event_id DIV 8192``), a bucket-count-
    sized prefix-max window, then a per-bucket running max with the
    carried prefix joined back in. The strictly-preceding frame makes
    the late flag tie-order-invariant: rows sharing an event_id share a
    ``ts`` in every dirty class (dup/conflict classes mutate payload,
    never ts), and a row's own ts joining the preceding max cannot flip
    its flag (``ts < ts - delay`` is always false). The differential
    sweep thus verifies the decomposition against the one-window
    spelling.
    """
    e = (
        load(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", "ts", "event_type")
        .withColumn("bkt", F.expr(f"event_id DIV {_C4_BUCKET}"))
    )
    bmax = e.groupBy("bkt").agg(F.max("ts").alias("bmax"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = bmax.withColumn("carry", F.max("bmax").over(wb)).select(
        "bkt", "carry"
    )
    wi = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        e.join(carry, "bkt")
        .withColumn("inmax", F.max("ts").over(wi))
        # explicit null-tolerant max: Spark greatest() returns NULL if
        # ANY argument is NULL pre-3.4-semantics ambiguity — spell the
        # CASE so both engines' decompositions agree bit-for-bit
        .withColumn(
            "wm_src",
            F.expr(
                "CASE WHEN carry IS NULL THEN inmax "
                "WHEN inmax IS NULL THEN carry "
                "WHEN inmax > carry THEN inmax ELSE carry END"
            ),
        )
        .withColumn(
            "is_late",
            F.expr(
                f"wm_src IS NOT NULL AND ts < wm_src - {_C4_DELAY}"
            ),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_late"), 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.sum(F.when(F.col("is_late"), 0).otherwise(1))
        .cast("long")
        .alias("n_ontime"),
    )


@query(
    "c5_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event
    FROM (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts NULLS LAST,
                                         event_id NULLS LAST) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def c5_dedup_first(spark: SparkSession, sf: str) -> DataFrame:
    """C5: keyed dedup keeping the earliest record — the deterministic batch
    analog of streaming ``dropDuplicates`` (which keeps the first arrival;
    event-time order makes it reproducible). NULL order keys pinned
    LAST on both engines (round-9 dirty corpus): an unstamped event
    must never win "earliest"."""
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"))
    )


@query(
    "c3_dynamic_session",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             ts + CASE WHEN event_type = 'purchase'
                       THEN INTERVAL 10 MINUTE
                       ELSE INTERVAL 5 MINUTE END AS ev_end
      FROM events WHERE ts IS NOT NULL),
    m AS (
      -- rno anchors the running sum below to the SAME tie order the
      -- running max saw (both ride window w in one pass): re-sorting
      -- by (ts, event_id) lets exact-duplicate rows cross the new_s
      -- flag and split a session nondeterministically (r14 — see the
      -- c3_session_window oracle note)
      SELECT user_id, ts, event_id, ev_end,
             MAX(ev_end) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_end,
             ROW_NUMBER() OVER w AS rno
      FROM g
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, rno,
             CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END
               AS new_s
      FROM m),
    i AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY rno
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM s)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS cnt
    FROM i GROUP BY user_id, sid
    """,
)
def c3_dynamic_session(spark: SparkSession, sf: str) -> DataFrame:
    """C3+: session windows with a DYNAMIC per-event gap — purchases hold
    the session open 10 minutes, everything else 5. Spark's
    ``session_window(ts, gap_expr)`` merges overlapping [ts, ts+gap)
    windows; the oracle is the running-max gaps-and-islands rewrite
    (new session when ts >= max of all previous event-ends). Same
    expression works unchanged under Structured Streaming
    (``streaming.ops.session_agg`` accepts the same gap expression).
    NULL timestamps excluded explicitly on both engines (c1 note).
    """
    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    # session_window wants CalendarIntervalType — interval literals parse
    # as DayTimeIntervalType, so route through string interval values
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("10 minutes")
    ).otherwise(F.lit("5 minutes"))
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "cnt",
        )
    )


@query(
    "c6_stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM events
    JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment, event_type
    """,
)
def c6_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """C6 oracle leg: stream⋈static enrichment, evaluated batch-side.

    Runs the IDENTICAL ``streaming.ops.stream_static_join`` helper the
    streaming tests drive (broadcast of the static customer dim — each
    micro-batch joins map-side with zero stream shuffle); the DuckDB
    oracle hash-checks the join+rollup semantics shared by both paths.
    """
    from event_streamer_spark.streaming.ops import stream_static_join

    e = load(spark, sf, "events")
    cust = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = stream_static_join(
        e, cust, F.col("c_custkey") == F.col("user_id")
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        # integer-cents sum (the c1 round-9 seed-777 note)
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100
        ).alias("total"),
    )


@query(
    "c7_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS secs_after
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <  c.ts + INTERVAL 30 MINUTE
    """,
)
def c7_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """C7 oracle leg: stream⋈stream interval join (click→purchase by
    the same user within 30 minutes), evaluated batch-side.

    Runs the IDENTICAL ``streaming.ops.stream_stream_join`` helper the
    streaming tests drive — equi-join on user_id with the event-time
    range as residual, both sides watermarked (a no-op in batch, the
    state-eviction bound in streaming). The oracle hash-checks the
    interval-join semantics shared by both paths. At scale the shuffle
    keys on the uniform user_id; the time-range residual never widens
    the join beyond the watermark horizon.
    """
    from event_streamer_spark.streaming.ops import stream_stream_join

    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        )
    )
    joined = stream_stream_join(
        clicks, purchases, cond, "click_ts", "purchase_ts", "30 minutes"
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("bigint").alias("secs_after"),
    )


@query(
    "c1_windowed_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    r AS (
      SELECT w, user_id, cnt,
             ROW_NUMBER() OVER (PARTITION BY w
                                ORDER BY cnt DESC, user_id NULLS LAST)
               AS rn
      FROM c)
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, cnt, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def c1_windowed_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """C1×D10: per-window heavy hitters — the top-3 most active users
    in each 1-hour tumbling window, with a deterministic (count desc,
    user_id) tiebreak.

    The groupBy((window, user)) count is map-side combinable, so the
    rank runs over the ALREADY-aggregated table (one row per active
    user per window, not per event). Per-window partitions are bounded
    by active-user cardinality; at extreme per-window cardinality the
    same query routes through ``distrank.two_level_row_number`` on the
    count column — here the aggregated table is the smaller of the two
    by orders of magnitude, which is the point of aggregating first.
    NULL timestamps excluded explicitly on both engines (c1 note);
    NULL user_id tiebreaks pinned LAST.
    """
    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    counts = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rn = F.row_number().over(
        Window.partitionBy("w").orderBy(
            F.desc("cnt"), F.col("user_id").asc_nulls_last()
        )
    )
    return (
        counts.withColumn("rn", rn.cast("int"))
        .filter(F.col("rn") <= 3)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "user_id",
            "cnt",
            "rn",
        )
    )
