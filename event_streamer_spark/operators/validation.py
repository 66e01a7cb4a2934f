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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

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
        AVG(CAST(n_chars AS DOUBLE)) AS mean_chars
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
        F.avg(F.col("n_chars").cast("double")).alias("mean_chars"),
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


@query(
    "d14_column_drift",
    oracle=f"""
    WITH counts AS (
      SELECT LEAST(CAST(FLOOR(n_chars / {_PSI_WIDTH}) AS INT),
                   {_PSI_BINS - 1}) AS bin,
             COUNT(*) AS n_ref,
             COUNT(*) FILTER (WHERE lang = 'en') AS n_cur
      FROM documents GROUP BY 1
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
    scan + two tiny broadcasts.
    """
    d = load(spark, sf, "documents")
    bin_col = F.least(
        F.floor(F.col("n_chars") / _PSI_WIDTH).cast("int"),
        F.lit(_PSI_BINS - 1),
    )
    counts = (
        d.select(bin_col.alias("bin"), "lang")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_ref"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("n_cur"),
        )
    )
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
