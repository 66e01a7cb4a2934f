"""Composed training-data curation pipeline (D1+D4 end-to-end).

One declarative chain — exactly what a pretraining-data job runs per
shard, expressed so Catalyst fuses the scalar stages into a single pass
over the scan:

    exact-dedup (sha2)  →  quality filter  →  token stats  →  final
    projection with a stable doc fingerprint

The whole pipeline is SQL-expressible, so the DuckDB oracle checks the
composition, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_MIN_TOKENS = 40
_MAX_STOPWORD_RATIO = 0.25
_STOP = ("the", "a", "of", "and", "to", "in")


@query(
    "d6_curation_pipeline",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, text, lang, source, sha256(text) AS content_hash,
             ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM documents),
    deduped AS (SELECT * FROM hashed WHERE rn = 1),
    scored AS (
      SELECT doc_id, lang, source, content_hash,
             string_split(text, ' ') AS toks
      FROM deduped),
    metrics AS (
      SELECT doc_id, lang, source, content_hash,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             ROUND(CAST(len(list_filter(toks, x -> x IN {_STOP!r})) AS DOUBLE)
                   / len(toks), 6) AS stop_ratio
      FROM scored)
    SELECT doc_id, lang, source, content_hash, n_tokens, stop_ratio
    FROM metrics
    WHERE n_tokens >= {_MIN_TOKENS} AND stop_ratio <= {_MAX_STOPWORD_RATIO}
    """,
)
def d6_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """D6: dedup → quality-filter → stats, fused into one declarative plan.

    Scale shape: one shuffle for the dedup window (hash-partitioned on
    content hash — uniform, skew-free), everything else narrow. The
    quality filter runs BEFORE any expensive downstream stage would, so
    rejected documents never reach tokenization-heavy operators.
    """
    stop_list = ", ".join(f"'{w}'" for w in _STOP)
    docs = load(spark, sf, "documents").withColumn(
        "content_hash", F.sha2("text", 256)
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("toks", F.split("text", " "))
    )
    metrics = deduped.select(
        "doc_id",
        "lang",
        "source",
        "content_hash",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.expr(f"size(filter(toks, x -> x IN ({stop_list})))").cast("double")
            / F.size("toks"),
            6,
        ).alias("stop_ratio"),
    )
    return metrics.filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("stop_ratio") <= _MAX_STOPWORD_RATIO)
    )
