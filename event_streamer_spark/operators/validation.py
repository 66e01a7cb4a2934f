"""D14: dataset-level validation — declarative quality constraints and
distribution-drift measurement.

The reference validates per-MESSAGE shape at the producer boundary
(``src/producer/index.ts`` reject rules, A13); a 100 TB training-data
pipeline needs the DATASET-level analog: assert completeness /
uniqueness / bounds / value-set containment over a whole snapshot, and
quantify how a filtered or refreshed snapshot drifts from its
reference distribution before training on it. Public design ancestors:
AWS Deequ's constraint suites and the Population Stability Index used
for drift monitoring.

Scale shape: every metric here is a plain aggregate with FILTER
clauses — ONE scan, map-side combinable partials, no driver-side
state; the drift query adds only a broadcast join onto a 10-row bin
spine. Both are exactly SQL-expressible and DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load, register_views

_ALLOWED_LANGS = ("en", "fr", "es", "de", "zh")

# constraint thresholds are part of the declared suite (a real
# deployment would configure these); metric semantics per check:
#   completeness_text  fraction of non-NULL text            >= 0.999
#   uniqueness_doc_id  distinct doc_id / row count          >= 0.999999
#   min_n_chars        MIN(n_chars)                         >= 1
#   max_n_chars        MAX(n_chars)                         <= 100000
#   lang_allowed       fraction of lang in the allowed set  >= 0.999
#   mean_n_chars       AVG(n_chars)                         in [10, 10000]


@query(
    "d14_data_quality",
    oracle=f"""
    WITH m AS (
      SELECT
        AVG(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END)
          AS completeness,
        CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(*) AS uniq,
        CAST(MIN(n_chars) AS DOUBLE) AS mn,
        CAST(MAX(n_chars) AS DOUBLE) AS mx,
        AVG(CASE WHEN lang IN {_ALLOWED_LANGS!r} THEN 1.0 ELSE 0.0 END)
          AS lang_ok,
        -- exact-integer sum, ONE final division: AVG(double) partial
        -- sums are merge-order-sensitive once a hostile value nears
        -- 2^61 (round-10 seed 20260818: engines differed at the ulp).
        -- DECIMAL(38,0), not HUGEINT: this oracle is ALSO run on Spark
        -- by the violation test, so the exact type must parse on both
        CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
          / COUNT(n_chars) AS mean_chars
      FROM documents
    )
    SELECT 'completeness_text' AS check_name,
           ROUND(completeness, 6) AS metric,
           completeness >= 0.999 AS passed FROM m
    UNION ALL SELECT 'uniqueness_doc_id', ROUND(uniq, 6),
           uniq >= 0.999999 FROM m
    UNION ALL SELECT 'min_n_chars', ROUND(mn, 6), mn >= 1 FROM m
    UNION ALL SELECT 'max_n_chars', ROUND(mx, 6), mx <= 100000 FROM m
    UNION ALL SELECT 'lang_allowed', ROUND(lang_ok, 6),
           lang_ok >= 0.999 FROM m
    UNION ALL SELECT 'mean_n_chars', ROUND(mean_chars, 6),
           mean_chars BETWEEN 10 AND 10000 FROM m
    """,
)
def d14_data_quality(spark: SparkSession, sf: str) -> DataFrame:
    """D14: Deequ-style constraint suite in ONE aggregate pass.

    All six metrics come out of a single ``agg()`` over one scan
    (map-side combinable; ``COUNT DISTINCT`` is the only expansion and
    Spark plans it as the standard two-stage distinct aggregate), then
    ``stack`` unpivots the 1-row frame to the (check_name, metric,
    passed) long format — no second scan, no driver-side evaluation.
    """
    d = load(spark, sf, "documents")
    m = d.agg(
        F.avg(
            F.when(F.col("text").isNotNull(), 1.0).otherwise(0.0)
        ).alias("completeness"),
        (
            F.countDistinct("doc_id").cast("double") / F.count(F.lit(1))
        ).alias("uniq"),
        F.min("n_chars").cast("double").alias("mn"),
        F.max("n_chars").cast("double").alias("mx"),
        F.avg(
            F.when(F.col("lang").isin(*_ALLOWED_LANGS), 1.0).otherwise(0.0)
        ).alias("lang_ok"),
        # exact DECIMAL(38,0) sum + one division — the float-sum
        # merge-order ledger class (round-10 seed 20260818)
        (
            F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("double")
            / F.count("n_chars")
        ).alias("mean_chars"),
    )
    return m.selectExpr(
        """stack(6,
             'completeness_text', ROUND(completeness, 6),
                 completeness >= 0.999D,
             'uniqueness_doc_id', ROUND(uniq, 6), uniq >= 0.999999D,
             'min_n_chars', ROUND(mn, 6), mn >= 1D,
             'max_n_chars', ROUND(mx, 6), mx <= 100000D,
             'lang_allowed', ROUND(lang_ok, 6), lang_ok >= 0.999D,
             'mean_n_chars', ROUND(mean_chars, 6),
                 mean_chars BETWEEN 10D AND 10000D
           ) AS (check_name, metric, passed)"""
    )


# PSI binning: equal-width n_chars bins of 64, capped into the top bin.
_PSI_BINS = 10
_PSI_WIDTH = 64


def psi_bin_counts(d: DataFrame) -> DataFrame:
    """One scan of a documents-shaped frame → (bin, n_ref, n_cur)
    conditional histogram counts. Counts ADD across shards, so the
    streaming leg (``streaming.drift.drift_bins_batch``) appends each
    micro-batch's output of THIS function and merges with SUM at read —
    the same merge-is-addition contract as the count-min/HLL indexes.

    Binning is TOTAL over non-NULL values (review r8, both confirmed by
    differential runs on perturbed fixtures): negative ``n_chars``
    clamps into bin 0 — an out-of-spine bin would silently desync the
    two engines' denominators in :func:`psi_from_counts` — and NULL
    ``n_chars`` rows are EXCLUDED rather than riding ``LEAST``'s
    NULL-skip into the top bin (a completeness collapse must read as
    missing data, not as drift toward long documents; the
    ``d14_data_quality`` completeness check is the alarm for that)."""
    # clamp BEFORE the INT cast (round-10 hostile_media_fields: a 2^60
    # n_chars made floor() exceed INT32 and ANSI raised CAST_OVERFLOW
    # on Spark — and DuckDB's CAST raises the same way — so both
    # engines clamp in BIGINT and cast the already-bounded bin)
    bin_col = F.greatest(
        F.least(
            F.floor(F.col("n_chars") / _PSI_WIDTH),
            F.lit(_PSI_BINS - 1).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
    ).cast("int")
    return (
        d.filter(F.col("n_chars").isNotNull())
        .select(bin_col.alias("bin"), "lang")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_ref"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("n_cur"),
        )
    )


def psi_from_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """(bin, n_ref, n_cur) histogram → the PSI term table: full
    ``_PSI_BINS``-row spine (empty bins as deterministic rows), Laplace
    smoothing (+0.5 per bin) keeping log ratios finite, per-bin
    ``(p_cur - p_ref) * ln(p_cur / p_ref)`` terms that sum to the PSI."""
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    # totals as unpartitioned window sums over the 10-row joined frame,
    # NOT a separate counts.agg(): that spelling duplicated the whole
    # counts subtree (two parquet scans in the plan — caught round 8 by
    # .explain); the window runs on 10 rows on one task, free
    joined = spine.join(F.broadcast(counts), "bin", "left").select(
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    from pyspark.sql import Window

    whole = Window.partitionBy()
    p = joined.select(
        "bin",
        (
            (F.col("n_ref") + 0.5)
            / (F.sum("n_ref").over(whole) + 0.5 * _PSI_BINS)
        ).alias("p_ref"),
        (
            (F.col("n_cur") + 0.5)
            / (F.sum("n_cur").over(whole) + 0.5 * _PSI_BINS)
        ).alias("p_cur"),
    )
    return p.select(
        "bin",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
            6,
        ).alias("psi_term"),
    )


@query(
    "d14_column_drift",
    oracle=f"""
    WITH counts AS (
      SELECT CAST(GREATEST(LEAST(FLOOR(n_chars / {_PSI_WIDTH}),
                                 {_PSI_BINS - 1}), 0) AS INT) AS bin,
             COUNT(*) AS n_ref,
             COUNT(*) FILTER (WHERE lang = 'en') AS n_cur
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
    ), spine AS (
      SELECT CAST(range AS INT) AS bin FROM range({_PSI_BINS})
    ), p AS (
      SELECT s.bin,
             (COALESCE(c.n_ref, 0) + 0.5)
               / (t.t_ref + 0.5 * {_PSI_BINS}) AS p_ref,
             (COALESCE(c.n_cur, 0) + 0.5)
               / (t.t_cur + 0.5 * {_PSI_BINS}) AS p_cur
      FROM spine s LEFT JOIN counts c ON s.bin = c.bin CROSS JOIN tot t
    )
    SELECT bin, ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
    FROM p
    """,
)
def d14_column_drift(spark: SparkSession, sf: str) -> DataFrame:
    """D14: Population Stability Index of the ``n_chars`` distribution,
    current slice (``lang='en'``) vs the full-corpus reference.

    One scan produces both histograms via FILTER-ed conditional counts;
    a broadcast join onto the 10-row bin spine keeps empty bins as
    deterministic rows, and Laplace smoothing (+0.5 per bin) keeps the
    log ratio finite where a bin is empty on one side. The per-bin
    ``psi_term`` rows sum to the PSI; at 100 TB this is the same one
    scan + two tiny broadcasts. Body = :func:`psi_bin_counts` →
    :func:`psi_from_counts`, THE two pieces the incremental leg
    (``streaming.drift``) reuses so it can never drift from this
    batch definition.
    """
    return psi_from_counts(spark, psi_bin_counts(load(spark, sf, "documents")))


@query(
    "d14_ks_drift",
    oracle="""
    WITH v AS (
      SELECT n_chars AS v,
             COUNT(*) FILTER (WHERE lang = 'en') AS ca,
             COUNT(*) FILTER (WHERE lang <> 'en') AS cb
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ), c AS (
      SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
             SUM(cb) OVER (ORDER BY v) AS cum_b,
             SUM(ca) OVER () AS tot_a,
             SUM(cb) OVER () AS tot_b
      FROM v
    )
    SELECT ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / tot_a
                         - CAST(cum_b AS DOUBLE) / tot_b)), 6) AS ks_stat,
           CAST(MAX(tot_a) AS BIGINT) AS n_en,
           CAST(MAX(tot_b) AS BIGINT) AS n_other
    FROM c
    """,
)
def d14_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    """D14: EXACT two-sample Kolmogorov–Smirnov statistic between the
    ``n_chars`` distributions of the 'en' slice and the rest of the
    corpus — sup over values of |CDF_en − CDF_other|, the
    scale-free complement to PSI's binned view (PSI needs a bin width;
    KS is distribution-free).

    Scale shape: the per-row work is ONE map-side-combinable
    ``GROUP BY value`` (the only pass over the corpus); the ordered
    cumulative-sum window then runs over the DISTINCT-value table —
    bounded by the column's cardinality (~hundreds here; document
    lengths, not documents), so the single-task ordered window is over
    an already-reduced frame, same shape as ``b34_histogram``. For an
    unbounded-cardinality double column, pre-bucket (quantize) first or
    rank with ``distrank`` — the sup over a quantized grid lower-bounds
    KS with error ≤ the max bin mass.
    """
    from pyspark.sql import Window

    d = load(spark, sf, "documents")
    # NULL n_chars is excluded on BOTH engines: the KS sup is over
    # observed values, and an unfiltered NULL row would sort NULLS
    # FIRST under Spark's window vs NULLS LAST under DuckDB's,
    # shifting the two CDFs differently (review r8, confirmed by a
    # differential run on a perturbed fixture)
    v = (
        d.filter(F.col("n_chars").isNotNull())
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.count(F.when(F.col("lang") == "en", 1)).alias("ca"),
            F.count(F.when(F.col("lang") != "en", 1)).alias("cb"),
        )
    )
    w_ord = Window.orderBy("v")  # |distinct values| rows, one task
    w_all = Window.partitionBy()
    c = v.select(
        F.sum("ca").over(w_ord).alias("cum_a"),
        F.sum("cb").over(w_ord).alias("cum_b"),
        F.sum("ca").over(w_all).alias("tot_a"),
        F.sum("cb").over(w_all).alias("tot_b"),
    )
    return c.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("tot_a")
                    - F.col("cum_b").cast("double") / F.col("tot_b")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("tot_a").cast("bigint").alias("n_en"),
        F.max("tot_b").cast("bigint").alias("n_other"),
    )


@query(
    "d15_anomaly_mad",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type,
             2 * CAST(ROUND(value * 100) AS BIGINT) AS c2
      FROM events WHERE value IS NOT NULL
    ), m AS (
      SELECT event_type, CAST(MEDIAN(c2) AS BIGINT) AS med2
      FROM c GROUP BY 1
    ), d AS (
      SELECT c.event_type, 2 * ABS(c.c2 - m.med2) AS d4, m.med2
      FROM c JOIN m USING (event_type)
    ), md AS (
      SELECT event_type, CAST(MEDIAN(d4) AS BIGINT) AS mad4
      FROM d GROUP BY 1
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           MAX(d.med2) AS med2,
           MAX(md.mad4) AS mad4,
           COUNT(*) FILTER (WHERE d.d4 > 4.4478 * md.mad4) AS n_anomalies
    FROM d JOIN md USING (event_type)
    GROUP BY d.event_type
    """,
)
def d15_anomaly_mad(spark: SparkSession, sf: str) -> DataFrame:
    """D15: robust per-group anomaly detection — flag events whose
    ``value`` deviates from its event-type median by more than
    3 × 1.4826 × MAD (the normal-consistency robust z-score; 4.4478 is
    that product written once so both engines parse the same double).

    EXACT medians at scale: both median passes run through
    ``distrank.two_level_row_number`` (``mode='auto'``) — the same
    distributed order-statistic as ``b48_exact_median`` — never
    Catalyst's ``percentile``/``median`` aggregate, which buffers every
    value of a group in one executor's memory (the 100 TB killer for
    hot groups). All statistics stay in DOUBLED integer cents so each
    median (avg of two integral middles) is integral and float-exact:
    ``med2`` = 2×median cents, ``d4`` = 4×|deviation| cents,
    ``mad4`` = 4×MAD cents. The med/MAD dimension tables are
    group-cardinality-sized → broadcast joins; the flag predicate
    compares the SAME doubles on both engines.

    Scan budget: exact median-of-deviations is inherently two-pass, and
    this plan pays exactly two fact scans — the median rank pass reads
    the raw table, then the deviation frame is ``bounded_persist``-ed so
    BOTH its consumers (the MAD rank pass and the final flag aggregate)
    read the cache instead of re-scanning (4 scans → 2, audited via
    ``executedPlan``).

    NULL ``value`` rows are excluded on BOTH engines: DuckDB's
    ``MEDIAN`` skips NULLs while a Spark rank over the unfiltered frame
    would COUNT them (NULLS FIRST), silently shifting which rows are
    the middle ranks — the same dirty-data parity class the review-r8
    differential runs caught in the drift queries.
    """
    from event_streamer_spark.caching import bounded_persist
    from event_streamer_spark.operators.distrank import (
        middle_ranks,
        two_level_row_number,
    )

    ev = load(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        (F.lit(2) * F.round(F.col("value") * 100).cast("long")).alias("c2"),
    )
    def mid():
        return middle_ranks(F.col("rn"), F.col("n"))

    # two two-level calls in ONE plan (median, then MAD): distinct
    # slots, or the MAD call's persist evicts the median's bucketed
    # frame at build time and the at-scale two-level path recomputes
    # the whole upstream subtree per consumer (r13)
    ranked = two_level_row_number(
        ev, ["event_type"], ["c2", "event_id"], bucket_value="c2",
        out_col="rn", count_col="n", mode="auto",
        slot="distrank.bucketed.d15_med",
    )
    med = (
        ranked.filter(mid())
        .groupBy("event_type")
        .agg(F.avg("c2").cast("bigint").alias("med2"))
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "med2",
        (F.lit(2) * F.abs(F.col("c2") - F.col("med2"))).alias("d4"),
    )
    # narrow numeric frame on the critical path → uncompressed build
    dev = bounded_persist(
        dev, "d15_anomaly_dev", columnar_compressed=False,
        columnar_batch_size=100_000,
    )
    ranked2 = two_level_row_number(
        dev, ["event_type"], ["d4", "event_id"], bucket_value="d4",
        out_col="rn", count_col="n", mode="auto",
        slot="distrank.bucketed.d15_mad",
    )
    mad = (
        ranked2.filter(mid())
        .groupBy("event_type")
        .agg(F.avg("d4").cast("bigint").alias("mad4"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med2").alias("med2"),
            F.max("mad4").alias("mad4"),
            F.count(
                F.when(F.col("d4") > F.lit(4.4478) * F.col("mad4"), 1)
            ).alias("n_anomalies"),
        )
    )


# Benford expected first-digit probabilities, computed ONCE in Python
# and injected as identical double literals into BOTH engines' SQL —
# no dependence on each engine's libm LOG10 agreeing.
_BENFORD_P = [math.log10(1 + 1 / d) for d in range(1, 10)]


@query(
    "d14_benford",
    oracle=f"""
    WITH c AS (
      SELECT CAST(LEFT(CAST(CAST(ROUND(value * 100) AS BIGINT)
                            AS VARCHAR), 1) AS INT) AS digit
      FROM events WHERE ROUND(value * 100) >= 1
    ), obs AS (
      SELECT digit, COUNT(*) AS n_obs FROM c GROUP BY 1
    ), spine(digit, p_benford) AS (
      VALUES {", ".join(f"({d}, {p!r})" for d, p in enumerate(_BENFORD_P, 1))}
    ), t AS (
      SELECT SUM(n_obs) AS n FROM obs
    )
    SELECT s.digit,
           COALESCE(o.n_obs, 0) AS n_obs,
           ROUND(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / t.n, 6) AS p_obs,
           ROUND(s.p_benford, 6) AS p_benford,
           ROUND(POWER(COALESCE(o.n_obs, 0) - s.p_benford * t.n, 2)
                 / (s.p_benford * t.n), 6) AS chi2_term
    FROM spine s LEFT JOIN obs o ON s.digit = o.digit CROSS JOIN t
    """,
)
def d14_benford(spark: SparkSession, sf: str) -> DataFrame:
    """D14: Benford's-law first-digit audit of ``events.value`` — the
    classic fabricated-numbers screen. The first significant digit is
    read off the INTEGER cents string (leading digit is invariant under
    the ×100 scaling), so neither engine's ``LOG10`` is in the digit
    path, and the nine expected Benford probabilities are injected as
    the SAME Python-computed double literals on both sides. Per-digit
    ``chi2_term`` rows sum to the chi-square statistic (8 dof).

    Declared domain: the screen runs at CENTS precision — rows whose
    amount rounds below one cent are excluded on BOTH engines (their
    first significant digit is not recoverable from the cents integer;
    without this filter they'd misclassify as digit '0' AND put the two
    engines' denominators out of sync — review r8 finding, confirmed by
    a differential run on a perturbed fixture). With the filter, every
    observed digit is 1-9, so the spine covers all observations and the
    spine-side total equals the observed total.

    Scale shape: one map-side-combinable 9-group aggregate over the
    scan; the spine join and totals run on 9 rows.
    """
    from pyspark.sql import Window

    ev = load(spark, sf, "events").filter(
        F.round(F.col("value") * 100) >= 1
    )
    obs = (
        ev.select(
            F.substring(
                F.round(F.col("value") * 100).cast("long").cast("string"),
                1, 1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = spark.createDataFrame(
        [(d, p) for d, p in enumerate(_BENFORD_P, 1)],
        "digit int, p_benford double",
    )
    joined = spine.join(F.broadcast(obs), "digit", "left").select(
        "digit",
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        "p_benford",
    )
    n = F.sum("n_obs").over(Window.partitionBy())  # 9-row frame, free
    return joined.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / n, 6).alias("p_obs"),
        F.round("p_benford", 6).alias("p_benford"),
        F.round(
            F.pow(F.col("n_obs") - F.col("p_benford") * n, 2)
            / (F.col("p_benford") * n),
            6,
        ).alias("chi2_term"),
    )


# CUSUM decision threshold (in value units) — part of the declared
# monitor, as the constraint thresholds above are.
_CUSUM_H = 5.0


@query(
    "d15_changepoint_cusum",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents,
             COUNT(*) AS cnt
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1
    ), m AS (
      SELECT d,
             (10000 * CAST(cents AS HUGEINT)) // cnt AS dm_e6,
             (10000 * CAST(SUM(cents) OVER () AS HUGEINT))
               // SUM(cnt) OVER () AS target_e6
      FROM daily
    ), s AS (
      -- display double derives from the EXACT integer micro-units
      -- (r12, sf1-grain hostile seed 20260901): ROUND(double, 6) at a
      -- 4e10-magnitude day mean asks for more precision than a double
      -- holds, and the engines' ROUND implementations differ by 1 ulp
      -- there; CAST(exact int AS DOUBLE)/1e6 is bit-identical on both
      SELECT d, CAST(dm_e6 AS DOUBLE) / 1000000 AS day_mean,
             SUM(dm_e6 - target_e6) OVER (ORDER BY d) AS cum
      FROM m
    )
    SELECT d, day_mean,
           cum - LEAST(0, MIN(cum) OVER (ORDER BY d)) AS cusum_pos_e6,
           (cum - LEAST(0, MIN(cum) OVER (ORDER BY d)))
             > {int(_CUSUM_H * 1_000_000)} AS shifted
    FROM s
    """,
)
def d15_changepoint_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """D15: one-sided CUSUM change-point monitor over the daily mean of
    ``events.value``. The textbook recursion
    ``S_t = max(0, S_{{t-1}} + y_t)`` is NOT a plain window sum, but its
    closed form is: ``S_t = cum_t - min(0, cum_1..cum_t)`` (the 0 is the
    EMPTY prefix — dropping it understates S on an immediate upward
    shift, caught by the first-principles recursion test) — two
    cumulative windows, no recursion, no UDF. A day flags ``shifted`` when the
    upward drift since the best historical baseline exceeds the declared
    threshold.

    Parity by fixed point (round 9): the per-day means enter the CUSUM
    as EXACT integer micro-dollars ((10000·cents) DIV cnt, the DECIMAL
    DIV / HUGEINT // recipe) so the cumulative sums are bit-exact at
    ANY magnitude — the float spelling diverged by 1 ulp once the dirty
    corpus pushed day means past 2^45 micro-units. ``day_mean`` stays a
    (correctly-rounded, engine-identical) double for display. Scale
    shape: the corpus pass is one map-side-combinable daily aggregate;
    the ordered windows run over the #distinct-days table (bounded by
    the calendar, not the data).

    NULL ``value``/``ts`` rows are excluded on BOTH engines: SUM skips
    a NULL value but COUNT(*) would still count its row, silently
    diluting that day's mean — and a NULL day would become its own
    group-key row with engine-specific placement in the ordered CDF.
    """
    from pyspark.sql import Window

    daily = (
        load(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    w_all = Window.partitionBy()
    m = daily.select(
        "d",
        # Exact micro-unit means BEYOND int64 (round-9 dirty corpus: a
        # 1e15-unit outlier day overflows BIGINT micro-units, and three
        # naive spellings each fail — Spark's DIV always RETURNS a
        # long (wraps silently past 2^63 even from DECIMAL operands),
        # 10000·DECIMAL(38,0) hits the precision cap and nulls out,
        # and FLOOR(a/b) floors where DuckDB's // truncates AND rounds
        # at scale 6 first. The split division below stays exact:
        # quotient/remainder in in-range longs, recombined with exact
        # DECIMAL multiply/add — trunc(10000·c/n) ==
        # 10000·trunc(c/n) + trunc(10000·(c mod n)/n), probed equal to
        # DuckDB's HUGEINT // on both signs.
        F.expr(
            "CAST(cents DIV cnt AS DECIMAL(30,0)) * 10000"
            " + (10000 * (cents - (cents DIV cnt) * cnt)) DIV cnt"
        ).alias("dm_e6"),
        F.expr(
            "CAST(SUM(cents) OVER () DIV SUM(cnt) OVER ()"
            " AS DECIMAL(30,0)) * 10000"
            " + (10000 * (SUM(cents) OVER ()"
            "   - (SUM(cents) OVER () DIV SUM(cnt) OVER ())"
            "   * SUM(cnt) OVER ())) DIV SUM(cnt) OVER ()"
        ).alias("target_e6"),
    )
    w_ord = Window.orderBy("d")  # #days rows, one task
    s = m.select(
        "d",
        # display double from the EXACT integer micro-units (r12,
        # sf1-grain hostile seed 20260901): ROUND(double, 6) at a
        # 4e10-magnitude day mean asks for more precision than a
        # double holds and the engines' ROUND differ by 1 ulp there;
        # CAST(exact int AS DOUBLE)/1e6 is bit-identical on both
        (F.col("dm_e6").cast("double") / 1_000_000).alias("day_mean"),
        F.sum(F.col("dm_e6") - F.col("target_e6")).over(w_ord).alias("cum"),
    )
    cusum = F.col("cum") - F.least(
        F.lit(0).cast("decimal(38,0)"), F.min("cum").over(w_ord)
    )
    return s.select(
        "d",
        "day_mean",
        cusum.cast("decimal(38,0)").alias("cusum_pos_e6"),
        (cusum > int(_CUSUM_H * 1_000_000)).alias("shifted"),
    )


# EWMA smoothing alpha = 20/100 and the relative deviation trigger:
# flag a day when 4x the absolute deviation exceeds the running mean
# (i.e. the day strays more than 25% from the smoothed level).
_EWMA_ALPHA_PCT = 20


@query(
    "d15_ewma_monitor",
    oracle=f"""
    WITH RECURSIVE
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    idx AS (
      SELECT d, cents, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily),
    ew(i, d, cents, ewma) AS (
      SELECT i, d, cents, cents FROM idx WHERE i = 1
      UNION ALL
      -- FLOOR division, spelled exactly: DuckDB's // truncates toward
      -- zero on negatives (probed: -107 // 100 = -1) while the Spark
      -- side's Python fold floors (-2); subtracting the floor-mod
      -- first makes the numerator exactly divisible, so // agrees.
      -- Net-refund days make negative numerators an in-domain case.
      SELECT x.i, x.d, x.cents,
             (({_EWMA_ALPHA_PCT} * x.cents
               + {100 - _EWMA_ALPHA_PCT} * e.ewma)
              - ((({_EWMA_ALPHA_PCT} * x.cents
                   + {100 - _EWMA_ALPHA_PCT} * e.ewma) % 100) + 100) % 100
             ) // 100
      FROM ew e JOIN idx x ON x.i = e.i + 1)
    SELECT strftime(d, '%Y-%m-%d') AS d,
           cents AS day_cents,
           CAST(ewma AS BIGINT) AS ewma_cents,
           CAST(4 * ABS(cents - ewma) > ewma AS BOOLEAN) AS flagged
    FROM ew
    """,
)
def d15_ewma_monitor(spark: SparkSession, sf: str) -> DataFrame:
    """D15: EWMA level monitor over daily revenue — the classic
    exponentially-weighted control chart, in EXACT fixed-point
    integers via a recursive CTE (Spark 4 ``WITH RECURSIVE``).

    The float closed form ``Σ α(1−α)^(t−j) x_j`` is order-stable but
    engine-divergent in the last bits; the integer recursion
    ``e_t = floor((20·x_t + 80·e_{{t−1}}) / 100)`` is bit-exact on
    both engines, so the monitor — including the 25%-deviation boolean
    — carries a full hash oracle. FLOOR division specifically (review
    r8): Python's ``//`` floors but DuckDB's truncates toward zero, so
    the oracle subtracts the floor-mod before dividing; net-refund
    days make negative numerators an in-domain case, not a
    hypothetical.

    Shape: ONE map-combinable daily aggregate over the corpus; the
    sequential fold then runs DRIVER-SIDE over the collected daily
    table — bounded by the CALENDAR, not the data (#days rows: 30
    here, ~3.7k for a decade at 100 TB), the same documented-bound
    collect contract as the BPE merge loop (``bpe.py``). A Spark
    ``WITH RECURSIVE`` spelling was measured first and rejected: the
    recursion is semantically identical but schedules one job per
    level (~16 s for 30 days at ANY scale factor, pure fixed
    overhead), and Spark re-evaluates referenced plans each level —
    the wrong execution model for a calendar-length scan chain.
    """
    daily = (
        load(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    # bounded collect: one row per calendar day with events (see above)
    days = sorted(daily.collect(), key=lambda r: r["d"])
    out, ewma = [], None
    for r in days:
        if ewma is None:
            ewma = r["cents"]
        else:
            ewma = (
                _EWMA_ALPHA_PCT * r["cents"]
                + (100 - _EWMA_ALPHA_PCT) * ewma
            ) // 100
        out.append(
            (
                r["d"].strftime("%Y-%m-%d"),
                r["cents"],
                ewma,
                4 * abs(r["cents"] - ewma) > ewma,
            )
        )
    return spark.createDataFrame(
        out,
        "d string, day_cents long, ewma_cents long, flagged boolean",
    )


@query(
    "d14_json_key_census",
    oracle="""
    WITH ok AS (
      SELECT event_id, props FROM events
      WHERE props IS NOT NULL AND json_valid(props)
            AND json_type(props) = 'OBJECT'
            AND len(json_keys(props)) = len(list_distinct(json_keys(props)))),
    kv AS (
      SELECT o.event_id, u.k,
             TRY_CAST(json_extract_string(o.props, '$.' || u.k)
                      AS DOUBLE) AS d
      FROM ok o, UNNEST(json_keys(o.props)) AS u(k)),
    tot AS (SELECT COUNT(*) AS n FROM ok)
    SELECT k AS key,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6)
             AS presence_rate,
           CAST(COALESCE(SUM(CASE WHEN d IS NOT NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_numeric,
           CAST(MIN(CASE WHEN d IS NOT NULL AND NOT isnan(d)
                              AND ABS(d) <= 1e12
                         THEN CAST(ROUND(d * 100) AS BIGINT) END)
             AS BIGINT) AS min_cents,
           CAST(MAX(CASE WHEN d IS NOT NULL AND NOT isnan(d)
                              AND ABS(d) <= 1e12
                         THEN CAST(ROUND(d * 100) AS BIGINT) END)
             AS BIGINT) AS max_cents
    FROM kv GROUP BY k
    """,
)
def d14_json_key_census(spark: SparkSession, sf: str) -> DataFrame:
    """D14: semi-structured schema census over the JSON ``props``
    column — per top-level key: how many valid-object events carry it,
    its presence rate, how many values parse as numbers, and the
    numeric range in integer cents. The audit that catches producer
    schema drift (a renamed key, a number that became a string) before
    a downstream extract silently NULLs out.

    Validity contract, identical on BOTH engines (review r8 #4 aligned
    three divergent acceptance sets): an event enters the census iff
    its props is a strict-JSON OBJECT with no duplicate top-level keys
    — non-object JSON (arrays/scalars, which DuckDB's ``json_valid``
    accepts but a map parse nulls), single-quoted pseudo-JSON (which
    Spark's lenient parser accepts — ``allowSingleQuotes`` is
    explicitly disabled), and duplicate-key objects (where path
    extraction and map explosion see different values) are ALL
    excluded as malformed. The numeric range is guarded against NaN
    and |v| > 1e12 (an unguarded cents cast would crash the audit on
    exactly the drifted data it exists to flag); such values still
    count in ``n_numeric``, they just don't bound the range. Shape:
    one narrow explode, one map-combinable aggregate on the key;
    presence denominator is a broadcast 1-row count.
    """
    e = load(spark, sf, "events")
    m = e.select(
        "event_id",
        F.from_json(
            "props",
            "map<string,string>",
            {"allowSingleQuotes": "false"},
        ).alias("m"),
    ).filter(
        F.col("m").isNotNull()
        & (
            F.size(F.map_keys("m"))
            == F.size(F.array_distinct(F.map_keys("m")))
        )
    )
    kv = m.select("event_id", F.explode("m").alias("key", "v"))
    tot = m.agg(F.count(F.lit(1)).alias("n"))
    num = F.expr("TRY_CAST(v AS DOUBLE)")
    in_range = num.isNotNull() & ~F.isnan(num) & (F.abs(num) <= 1e12)
    cents = F.when(in_range, F.round(num * 100).cast("long"))
    return (
        kv.crossJoin(F.broadcast(tot))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.first("n"), 6
            ).alias("presence_rate"),
            F.coalesce(
                F.sum(F.when(num.isNotNull(), 1).otherwise(0)), F.lit(0)
            ).alias("n_numeric"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )


@query(
    "d15_trend_ols",
    oracle="""
    WITH daily AS (
      SELECT r.r_name,
             CAST(DATEDIFF('day', DATE '1992-01-01', o.o_orderdate)
                  AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, o.o_orderdate),
    sums AS (
      SELECT r_name,
             CAST(COUNT(*) AS DECIMAL(38,0))  AS n,
             CAST(SUM(x) AS DECIMAL(38,0))    AS sx,
             CAST(SUM(y) AS DECIMAL(38,0))    AS sy,
             CAST(SUM(x*x) AS DECIMAL(38,0))  AS sxx,
             CAST(SUM(x*y) AS DECIMAL(38,0))  AS sxy
      FROM daily GROUP BY r_name)
    SELECT r_name,
           CAST(n AS BIGINT) AS n_days,
           CAST(n*sxy - sx*sy AS VARCHAR)  AS slope_num,
           CAST(n*sxx - sx*sx AS VARCHAR)  AS slope_den,
           CAST(CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END
                * ((ABS(CAST(n*sxy - sx*sy AS HUGEINT)) * 10000000
                    // NULLIF(CAST(n*sxx - sx*sx AS HUGEINT), 0)
                    + 5) // 10) AS BIGINT) AS slope_micro_per_day
    FROM sums
    """,
)
def d15_trend_ols(spark: SparkSession, sf: str) -> DataFrame:
    """D15: exact least-squares revenue trend per region — the
    closed-form OLS slope over the (day index, daily revenue cents)
    series: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). The numerator
    and denominator are computed in DECIMAL(38,0) (exact on both
    engines; BIGINT would overflow n·Σxy around sf1 — n≈2.4k days ×
    Σxy≈10^16) and emitted as digit strings, so the regression itself
    hash-matches exactly; the readable cents/day slope is the one
    double division, rounded to the repo's 6-decimal grain.

    Scale: one fact shuffle (orders ⨝ customer on the customer key)
    with the nation⨝region chain broadcast onto customer first (the
    TPC-H Q5 dimension-collapse); the daily aggregate is map-side
    combinable on (region, day); the moment sums collapse to 5 rows.
    Per-term products x·y stay within BIGINT (x ≤ 2557 days,
    y ≤ daily-region cents) before the DECIMAL widening of the SUMS —
    the overflow-prone step — mirroring d7_neyman_sample's
    DECIMAL(38,0) exact-moment protocol.
    """
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf, "region").select("r_regionkey", "r_name")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("c_custkey", "r_name")
    daily = (
        o.join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("r_name", "o_orderdate")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("y")
        )
        .select(
            "r_name",
            F.datediff(
                F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).cast("bigint").alias("x"),
            "y",
        )
    )
    sums = daily.groupBy("r_name").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("x*x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("x*y")).cast("decimal(38,0)").alias("sxy"),
    )
    return sums.select(
        "r_name",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr("CAST(n*sxy - sx*sy AS STRING)").alias("slope_num"),
        F.expr("CAST(n*sxx - sx*sx AS STRING)").alias("slope_den"),
        F.expr(
            "CAST(CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END"
            " * ((ABS(n*sxy - sx*sy) * 10000000"
            "     DIV NULLIF(n*sxx - sx*sx, 0)"
            "     + 5) DIV 10) AS BIGINT)"
        ).alias("slope_micro_per_day"),
    )


# (table, column) pairs the census profiles: the low-cardinality
# categorical columns a Deequ-style profiler would target first.
_CENSUS_COLS = (
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("events", "event_type"),
    ("documents", "lang"),
)


@query(
    "d14_entropy_census",
    oracle="""
    WITH vals AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'l_returnflag', l_returnflag FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', l_linestatus FROM lineitem
      UNION ALL
      SELECT 'event_type', event_type FROM events
      UNION ALL
      SELECT 'lang', lang FROM documents),
    counts AS (
      SELECT col, val, CAST(COUNT(*) AS BIGINT) AS c
      FROM vals WHERE val IS NOT NULL GROUP BY col, val),
    nulls AS (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n_null
      FROM vals WHERE val IS NULL GROUP BY col)
    SELECT k.col,
           CAST(SUM(k.c) AS BIGINT)        AS n_values,
           CAST(COUNT(*) AS BIGINT)        AS n_distinct,
           CAST(COALESCE(MAX(n.n_null), 0) AS BIGINT) AS n_null,
           (1000000 * MAX(k.c)) // SUM(k.c) AS top_share_ppm,
           ROUND(LN(CAST(SUM(k.c) AS DOUBLE))
                 - SUM(CAST(k.c AS DOUBLE) * LN(CAST(k.c AS DOUBLE)))
                   / CAST(SUM(k.c) AS DOUBLE), 6) AS entropy_nats
    FROM counts k LEFT JOIN nulls n ON n.col = k.col
    GROUP BY k.col
    """,
)
def d14_entropy_census(spark: SparkSession, sf: str) -> DataFrame:
    """D14: categorical-column profile census — per profiled column:
    value count, distinct count, NULL count (tracked separately, the
    Deequ completeness convention — no sentinel collisions, the
    b65_snapshot_diff lesson), mode share in exact integer ppm, and
    Shannon entropy in nats via ln(N) − Σc·ln(c)/N (all from exact
    BIGINT counts; ln on the shared libm, 6-decimal grain — the
    d4_bigram_logprob float protocol).

    Scale: one scan per profiled TABLE (each table's columns ride one
    projection, unioned as narrow (col, val) rows — the same Expand
    shape as b67_unpivot), one map-side-combinable count shuffle on
    (col, value) — low-cardinality by construction for categorical
    profiling — and a 6-key final rollup. The entropy aggregate runs
    over per-VALUE counts, never raw rows.
    """
    frames = []
    by_table: dict[str, list[str]] = {}
    for tbl, col in _CENSUS_COLS:
        by_table.setdefault(tbl, []).append(col)
    for tbl, cols in by_table.items():
        frames.append(
            census_value_counts(load(spark, sf, tbl), cols)
        )
    counts = frames[0]
    for f in frames[1:]:
        counts = counts.unionByName(f)
    return census_from_counts(counts)


def census_value_counts(df: DataFrame, cols: list) -> DataFrame:
    """One table's profiled columns as (col, val, c) counts — the
    shard unit of the census: counts ADD, so per-micro-batch shards
    merge with SUM (the ``psi_bin_counts`` contract). NULL values keep
    their own (col, NULL) group; the rollup splits them out."""
    stack_args = ", ".join(f"'{c}', {c}" for c in cols)
    return (
        df.selectExpr(f"stack({len(cols)}, {stack_args}) AS (col, val)")
        .groupBy("col", "val")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def census_from_counts(counts: DataFrame) -> DataFrame:
    """The census rollup from merged (col, val, c) counts — THE one
    copy of the entropy/mode/null arithmetic, shared by the batch
    query and the streaming read so the two definitions cannot
    drift."""
    nonnull = counts.filter(F.col("val").isNotNull())
    nulls = (
        counts.filter(F.col("val").isNull())
        .groupBy("col")
        .agg(F.sum("c").cast("bigint").alias("n_null"))
    )
    return (
        nonnull.groupBy("col")
        .agg(
            F.sum("c").cast("bigint").alias("n_values"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.max("c").alias("max_c"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
                / F.sum("c").cast("double"),
                6,
            ).alias("entropy_nats"),
        )
        .join(F.broadcast(nulls), "col", "left")
        .select(
            "col",
            "n_values",
            "n_distinct",
            F.coalesce(F.col("n_null"), F.lit(0)).cast("bigint").alias(
                "n_null"
            ),
            F.expr("(1000000 * max_c) DIV n_values").alias(
                "top_share_ppm"
            ),
            "entropy_nats",
        )
    )


@query(
    "d15_seasonal_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(EXTRACT(DOW FROM CAST(o_orderdate AS DATE)) + 1
                  AS BIGINT) AS dow1,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS daily_c
      FROM orders GROUP BY 1, 2),
    base AS (
      SELECT day, dow1, daily_c,
             SUM(daily_c) OVER (PARTITION BY dow1) AS dow_sum,
             COUNT(*)     OVER (PARTITION BY dow1) AS dow_cnt
      FROM daily),
    scored AS (
      SELECT day, dow1, daily_c, dow_cnt,
             CAST((CAST(1000000 AS HUGEINT) * daily_c
                   * (dow_cnt - 1))
                  // NULLIF(CAST(dow_sum AS HUGEINT) - daily_c, 0)
                  AS BIGINT) AS ratio_ppm
      FROM base)
    SELECT STRFTIME(day, '%Y-%m-%d') AS day, dow1, daily_c,
           ratio_ppm,
           CAST(COALESCE(dow_cnt > 1
                         AND (ratio_ppm < 500000 OR ratio_ppm > 2000000),
                         FALSE) AS BIGINT) AS is_anomaly
    FROM scored
    """,
)
def d15_seasonal_dow(spark: SparkSession, sf: str) -> DataFrame:
    """D15: seasonally-adjusted revenue anomaly — each day's revenue
    against the LEAVE-ONE-OUT mean of its own day-of-week cohort
    (weekly seasonality is the first thing a raw daily-mean monitor
    like ``d15_ewma_monitor`` mistakes for drift; LOO keeps a spike
    from masking itself in its own baseline). The ratio is an exact
    integer ppm — daily·(cnt−1)·10⁶ DIV (Σcohort − daily) — with the
    anomaly band [0.5×, 2×] decided in integer arithmetic; a
    single-sample cohort has no baseline and emits NULL/0 — guarded
    in the DIVISOR via NULLIF, not just a CASE around the expression,
    because Spark's ANSI mode evaluates the DIV inside a boolean band
    check even when the guarding conjunct is false (the dirty fixture
    found exactly this: one NULL-date singleton cohort →
    DIVIDE_BY_ZERO). Day-of-week numbering is the pinned
    ``b22_dow_parity`` recipe (Spark ``dayofweek`` == DuckDB
    ``EXTRACT(DOW) + 1``).

    Scale: the daily aggregate is the only data-sized shuffle
    (map-side combinable on the date key); the cohort windows run over
    the DAYS frame, whose size is calendar-bounded (~365 rows/year
    regardless of corpus size), partitioned across 7 keys. ppm bound:
    10⁶·daily·cnt needs daily·cnt < 9.2·10¹² — daily cells beyond
    ~10⁹ cents with decade-long histories move to DECIMAL(38,0) per
    the d15_trend_ols protocol.
    """
    from pyspark.sql import Window

    daily = (
        load(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).cast("bigint").alias("daily_c")
        )
        .select(
            "day",
            F.dayofweek("day").cast("bigint").alias("dow1"),
            "daily_c",
        )
    )
    w = Window.partitionBy("dow1")
    base = daily.select(
        "day",
        "dow1",
        "daily_c",
        F.sum("daily_c").over(w).alias("dow_sum"),
        F.count("*").over(w).alias("dow_cnt"),
    )
    scored = base.select(
        "day",
        "dow1",
        "daily_c",
        "dow_cnt",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * daily_c"
            " * (dow_cnt - 1))"
            " DIV NULLIF(CAST(dow_sum AS DECIMAL(38,0)) - daily_c, 0)"
            " AS BIGINT)"
        ).alias("ratio_ppm"),
    )
    return scored.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow1",
        "daily_c",
        "ratio_ppm",
        F.coalesce(
            (F.col("dow_cnt") > 1)
            & (
                (F.col("ratio_ppm") < 500000)
                | (F.col("ratio_ppm") > 2000000)
            ),
            F.lit(False),
        ).cast("bigint").alias("is_anomaly"),
    )


# A/B experiment constants: deterministic assignment salt and the
# covariate/outcome period boundary (the events fixture spans
# 2024-01; CUPED needs a pre-period, so the month splits in half).
_AB_SPLIT = "2024-01-16"

from event_streamer_spark.operators.sketches import (  # noqa: E402
    _H13_DUCK,
)


@query(
    "d14_ab_cuped",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             {_H13_DUCK} % 2 AS variant,
             CAST(COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{_AB_SPLIT}')
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    FILTER (WHERE ts >= TIMESTAMP '{_AB_SPLIT}'
                            AND event_type = 'purchase'
                            AND value >= 0 AND value <= 1000000000),
                    0) AS BIGINT) AS y,
             CAST(COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_AB_SPLIT}'
                    AND event_type = 'purchase') > 0
                  AS BIGINT) AS converted
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT)   AS sx,
             CAST(SUM(y) AS BIGINT)   AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM users),
    by_variant AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT)       AS n_users,
             CAST(SUM(y) AS BIGINT)         AS sum_y_c,
             CAST(SUM(x) AS BIGINT)         AS sum_x,
             CAST(SUM(converted) AS BIGINT) AS conv_users
      FROM users GROUP BY variant)
    SELECT v.variant, v.n_users, v.sum_y_c, v.sum_x, v.conv_users,
           (1000000 * v.conv_users) // v.n_users AS conv_rate_ppm,
           CAST(CASE WHEN v.sum_y_c * td * p.n
                       - tn * (v.sum_x * p.n - p.sx * v.n_users) < 0
                THEN -1 ELSE 1 END
                * ((ABS(v.sum_y_c * td * p.n
                        - tn * (v.sum_x * p.n - p.sx * v.n_users))
                    * 10000000
                    // NULLIF(CAST(v.n_users AS HUGEINT) * td * p.n, 0)
                    + 5) // 10) AS VARCHAR) AS mean_y_adj_micro
    FROM by_variant v CROSS JOIN (
      SELECT n, sx, sy, sxx, sxy,
             CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS tn,
             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS td
      FROM pooled) p
    """,
)
def d14_ab_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """D14: A/B experiment readout with CUPED variance reduction
    (Deng et al., WSDM'13) — deterministic 50/50 assignment by the
    portable 52-bit md5 user hash (the d11 KMV spelling: Spark CONV ↔
    DuckDB char-fold, so assignment is REPRODUCIBLE across engines and
    reruns — the property that makes an experiment auditable), outcome
    = per-user purchase cents in the second half-month, covariate =
    pre-period activity count. Emits per variant: exact user/outcome/
    covariate/conversion tallies, integer-ppm conversion rate, and the
    CUPED-adjusted mean ȳ_v − θ·(x̄_v − x̄) with θ = cov(X,Y)/var(X)
    POOLED across variants (per-variant θ would bias the contrast).
    The adjusted mean is emitted as an exact micro-cents DIGIT STRING
    (seed-20260822 skew corpus: a mega-user holding 30% of events plus
    a 1e15-dollar hostile purchase pushed the value past int64 — the
    BIGINT cast errored on DuckDB, and Spark's DECIMAL(38,0)
    intermediates SILENTLY lost precision past 38 digits, a worse
    failure). The outcome domain is pinned to [0, 1e9] dollars per
    event (the Neyman/systematic sampler bound): that caps every
    intermediate product at ~1e35, provably inside DECIMAL(38,0) and
    HUGEINT on both engines. The product bound does NOT bound the
    final quotient |ȳ_adj|·1e7 under 2^63 (a whale variant — few
    users, many near-cap purchases — pushes the adjusted mean itself
    past long range, and Spark's DIV would wrap silently where
    DuckDB's HUGEINT // stays exact), so the Spark side computes that
    quotient by STAGED long division in DECIMAL(38,0) (see inline
    comment): exact for |ȳ_adj| ≤ ~1e23 (the Cauchy–Schwarz bound
    sd_y·√n with Σy in BIGINT and ≤1e8 users), NULL (loud) beyond the
    1e35 product bound, never wrapped. Negative
    purchase values (refund-like dirty rows) are excluded from the
    outcome on both engines, and NULL users/timestamps drop out before
    assignment.

    Scale: one map-side-combinable shuffle on the user key builds the
    per-user table; the variant rollup is a 2-key aggregate; pooled
    moments are a 1-row broadcast cross join. Moment bounds fit BIGINT
    through ~10¹² user-cents-activity products — beyond that, the
    d15_trend_ols DECIMAL(38,0) widening applies.
    """
    from event_streamer_spark.operators.sketches import _H13_SPARK

    split = f"TIMESTAMP '{_AB_SPLIT}'"
    users = (
        load(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(f"CAST(ts < {split} AS BIGINT)")
            ).cast("bigint").alias("x"),
            F.coalesce(
                F.sum(
                    F.expr(
                        f"CASE WHEN ts >= {split}"
                        " AND event_type = 'purchase'"
                        " AND value >= 0 AND value <= 1000000000"
                        " THEN CAST(ROUND(value * 100) AS BIGINT) END"
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("y"),
            F.max(
                F.expr(
                    f"CAST(ts >= {split}"
                    " AND event_type = 'purchase' AS BIGINT)"
                )
            ).cast("bigint").alias("converted"),
        )
        .withColumn("variant", F.expr(f"{_H13_SPARK} % 2"))
    )
    from event_streamer_spark.caching import bounded_persist

    users = bounded_persist(users, "d14_ab_users")  # two consumers
    pooled = users.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x*x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("x*y")).cast("bigint").alias("sxy"),
    )
    by_variant = users.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("y").cast("bigint").alias("sum_y_c"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("converted").cast("bigint").alias("conv_users"),
    )
    pooled_t = pooled.select(
        "n",
        "sx",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * sy"
        ).alias("tn"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx"
        ).alias("td"),
    )
    # Exact trunc(|num|·1e7 / den) WITHOUT any BIGINT-returning DIV on
    # the (potentially > 2^63) quotient: Spark's DIV always returns a
    # long and wraps silently past 2^63 (the d15_ewma lesson, line
    # ~600), while the DuckDB oracle's HUGEINT // stays exact — a
    # whale variant (many near-cap purchases on few users) makes the
    # adjusted-mean quotient itself overflow long even though every
    # PRODUCT is inside DECIMAL(38,0). Staged long division in base
    # 1e3/1e2/1e2 keeps every intermediate ≤ 1e3·den ≤ ~1e38:
    #   q0 = ⌊A/D⌋   exactly, via (A − A%D)/D — an integer-valued
    #        decimal divide; |ȳ_adj| ≤ sd_y·√n ≤ 9.2e18·1e4 ≈ 1e23
    #        (Σy is BIGINT, users ≤ 1e8), well inside the 32 integer
    #        digits DECIMAL(38,6) division keeps exactly;
    #   tᵢ  = next base-10^k digits of the quotient from the running
    #        remainder rᵢ < D (so rᵢ·10^k ≤ 1e38 for D ≤ ~1e35, the
    #        docstring's event-cap product bound; beyond it the
    #        arithmetic NULLs out loudly rather than wrapping).
    # Recombination: A·1e7 = D·(q0·1e7 + t1·1e4 + t2·1e2 + t3) + r3.
    half = by_variant.crossJoin(F.broadcast(pooled_t)).withColumns(
        {
            "num": F.expr(
                "sum_y_c * td * n - tn * (sum_x * n - sx * n_users)"
            ),
            "den": F.expr(
                "NULLIF(CAST(n_users AS DECIMAL(38,0)) * td * n, 0)"
            ),
        }
    ).withColumn("a0", F.expr("ABS(num)")).withColumns(
        {
            "q0": F.expr("CAST((a0 - a0 % den) / den AS DECIMAL(38,0))"),
            "r0": F.expr("a0 % den"),
        }
    ).withColumns(
        {
            "t1": F.expr(
                "CAST((r0 * 1000 - (r0 * 1000) % den) / den"
                " AS DECIMAL(38,0))"
            ),
            "r1": F.expr("(r0 * 1000) % den"),
        }
    ).withColumns(
        {
            "t2": F.expr(
                "CAST((r1 * 100 - (r1 * 100) % den) / den"
                " AS DECIMAL(38,0))"
            ),
            "r2": F.expr("(r1 * 100) % den"),
        }
    ).withColumn(
        "t3",
        F.expr("CAST((r2 * 100 - (r2 * 100) % den) / den AS DECIMAL(38,0))"),
    ).withColumn(
        "q7",
        F.expr("q0 * 10000000 + t1 * 10000 + t2 * 100 + t3"),
    )
    return half.select(
        "variant",
        "n_users",
        "sum_y_c",
        "sum_x",
        "conv_users",
        F.expr("(1000000 * conv_users) DIV n_users").alias(
            "conv_rate_ppm"
        ),
        F.expr(
            "CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END"
            " * CAST((q7 + 5 - (q7 + 5) % 10) / 10 AS DECIMAL(38,0))"
            " AS STRING)"
        ).alias("mean_y_adj_micro"),
    )


# Holt double-exponential smoothing: level alpha and trend beta in
# integer percent, same fixed-point contract as the EWMA monitor.
_HOLT_ALPHA_PCT = 20
_HOLT_BETA_PCT = 10


def _holt_floor_div(expr: str) -> str:
    """Exact FLOOR((expr)/100) in DuckDB: subtract the floor-mod first
    (``//`` truncates toward zero on negatives, Python floors — the
    d15_ewma_monitor review lesson; trend terms go negative on every
    declining series, so this is the common path, not an edge)."""
    return f"(({expr}) - (((({expr}) % 100) + 100) % 100)) // 100"


@query(
    "d15_holt_monitor",
    oracle=f"""
    WITH RECURSIVE
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    idx AS (
      SELECT d, cents, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily),
    h(i, d, cents, lvl, trd, fc) AS (
      SELECT i, d, cents, cents, CAST(0 AS BIGINT),
             CAST(NULL AS BIGINT)
      FROM idx WHERE i = 1
      UNION ALL
      SELECT x.i, x.d, x.cents,
             {_holt_floor_div(
                 f"{_HOLT_ALPHA_PCT} * x.cents"
                 f" + {100 - _HOLT_ALPHA_PCT} * (p.lvl + p.trd)"
             )},
             {_holt_floor_div(
                 f"{_HOLT_BETA_PCT} * ("
                 + _holt_floor_div(
                     f"{_HOLT_ALPHA_PCT} * x.cents"
                     f" + {100 - _HOLT_ALPHA_PCT} * (p.lvl + p.trd)"
                 )
                 + f" - p.lvl) + {100 - _HOLT_BETA_PCT} * p.trd"
             )},
             p.lvl + p.trd
      FROM h p JOIN idx x ON x.i = p.i + 1)
    SELECT strftime(d, '%Y-%m-%d') AS d,
           cents AS day_cents,
           CAST(lvl AS BIGINT) AS level_cents,
           CAST(trd AS BIGINT) AS trend_cents,
           CAST(fc AS BIGINT)  AS forecast_cents,
           CAST(fc IS NOT NULL AND 4 * ABS(cents - fc) > ABS(fc)
                AS BOOLEAN) AS flagged
    FROM h
    """,
)
def d15_holt_monitor(spark: SparkSession, sf: str) -> DataFrame:
    """D15: Holt double-exponential (level + trend) monitor over daily
    revenue — the control chart that does not mistake a steady ramp
    for drift the way a bare EWMA level does. EXACT fixed-point
    integer recursion, bit-identical on both engines:
    ``l_t = ⌊(20·x_t + 80·(l+t)_prev)/100⌋``,
    ``t_t = ⌊(10·(l_t − l_prev) + 90·t_prev)/100⌋``, one-step-ahead
    forecast ``f_t = l_prev + t_prev``, flag when the day strays more
    than 25% from its forecast. FLOOR division spelled via the
    floor-mod subtraction on the DuckDB side (trend terms go negative
    on every declining series — the d15_ewma_monitor review lesson,
    now on the path where it fires daily, and the init trend of 0
    keeps day 1 out of the flag domain).

    Shape: identical to ``d15_ewma_monitor`` — ONE map-combinable
    daily aggregate, then a CALENDAR-bounded driver fold (documented
    collect contract; a Spark ``WITH RECURSIVE`` spelling schedules
    one job per day, rejected there with measurements).
    """
    daily = (
        load(spark, sf, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    # bounded collect: one row per calendar day with events (see above)
    days = sorted(daily.collect(), key=lambda r: r["d"])
    out = []
    lvl = trd = None
    for r in days:
        if lvl is None:
            lvl, trd, fc = r["cents"], 0, None
        else:
            fc = lvl + trd
            new_lvl = (
                _HOLT_ALPHA_PCT * r["cents"]
                + (100 - _HOLT_ALPHA_PCT) * fc
            ) // 100
            trd = (
                _HOLT_BETA_PCT * (new_lvl - lvl)
                + (100 - _HOLT_BETA_PCT) * trd
            ) // 100
            lvl = new_lvl
        out.append(
            (
                r["d"].strftime("%Y-%m-%d"),
                r["cents"],
                lvl,
                trd,
                fc,
                fc is not None and 4 * abs(r["cents"] - fc) > abs(fc),
            )
        )
    return spark.createDataFrame(
        out,
        "d string, day_cents long, level_cents long, trend_cents long,"
        " forecast_cents long, flagged boolean",
    )


# -- D14: chi-square independence audit --------------------------------


@query(
    "d14_chi2_independence",
    oracle="""
    WITH d AS (
      SELECT lang, source FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL),
    cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM d GROUP BY lang, source),
    rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot
           FROM cells GROUP BY lang),
    ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ctot
           FROM cells GROUP BY source),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
    SELECT c.lang, c.source, c.o AS obs,
           CAST((1000000 * CAST(r.rtot AS HUGEINT) * t.ctot) // tot.n
                AS VARCHAR) AS exp_micro,
           CAST((1000000
                 * (CAST(tot.n AS HUGEINT) * c.o
                    - CAST(r.rtot AS HUGEINT) * t.ctot)
                 * (CAST(tot.n AS HUGEINT) * c.o
                    - CAST(r.rtot AS HUGEINT) * t.ctot))
                // (CAST(tot.n AS HUGEINT) * r.rtot * t.ctot)
               AS VARCHAR) AS chi2_cell_micro
    FROM cells c
    JOIN rt r USING (lang)
    JOIN ct t USING (source)
    CROSS JOIN tot
    """,
)
def d14_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    """D14: chi-square independence audit over the (lang, source)
    contingency table — the standard "is the corpus mix confounded"
    check (a source that only ships one language skews any per-source
    quality readout). Emits one row per observed cell with the exact
    observed count, the expected count in micro units, and the cell's
    chi² contribution in micro units: Σ cells ≫ (R−1)(C−1) flags
    dependence.

    Engine determinism: NO floating point anywhere — the cell
    statistic is the integer identity
    (O − E)²/E = (N·O − rtot·ctot)² / (N·rtot·ctot), computed in
    exact wide-integer arithmetic (Spark DECIMAL(38,0) ``DIV`` ↔
    DuckDB HUGEINT ``//``, the d15_trend_ols pairing) with truncating
    integer division at the micro grain, emitted as digit strings.
    Zero denominators are impossible (every joined cell has
    rtot, ctot, n ≥ 1). Exactness bound: intermediates reach
    1e6·(N·O)², inside 38 digits for corpora to ~1e8 classified rows —
    at larger scale the contingency COUNTS are additive, so shard the
    cell table and compute the statistic on merged counts (the sketch
    family's merge-is-addition contract).

    Scale: one narrow scan → one (lang, source) aggregate (cell-table
    sized, tiny), two re-aggregations of the CELL table (not the
    corpus), two broadcast-friendly joins + a 1-row cross join. The
    corpus is read once.
    """
    register_views(spark, sf)
    return spark.sql(
        """
        WITH d AS (
          SELECT lang, source FROM documents
          WHERE lang IS NOT NULL AND source IS NOT NULL),
        cells AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
          FROM d GROUP BY lang, source),
        rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot
               FROM cells GROUP BY lang),
        ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ctot
               FROM cells GROUP BY source),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
        SELECT c.lang, c.source, c.o AS obs,
               CAST((1000000 * CAST(r.rtot AS DECIMAL(38,0)) * t.ctot)
                    DIV tot.n AS STRING) AS exp_micro,
               CAST((1000000
                     * (CAST(tot.n AS DECIMAL(38,0)) * c.o
                        - CAST(r.rtot AS DECIMAL(38,0)) * t.ctot)
                     * (CAST(tot.n AS DECIMAL(38,0)) * c.o
                        - CAST(r.rtot AS DECIMAL(38,0)) * t.ctot))
                    DIV (CAST(tot.n AS DECIMAL(38,0)) * r.rtot * t.ctot)
                   AS STRING) AS chi2_cell_micro
        FROM cells c
        JOIN rt r USING (lang)
        JOIN ct t USING (source)
        CROSS JOIN tot
        """
    )
