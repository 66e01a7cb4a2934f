"""Batch analogs of the reference's event-dataflow operators (SURVEY §2.A).

Each query exercises an A-row primitive over the ``events`` /
``documents`` tables so the DuckDB oracle can hash-check it:

* A3  — corrupt-JSON drop (``from_json`` NULL filter)
* A5  — ``(topic, code)`` predicate dispatch as a filter
* A8  — fan-out via ``explode``
* A11 — envelope enrichment (createdAt/appName/code columns)
* A12 — UpperCamelCase subject normalization as a pure column expr
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.envelope import upper_camel_col
from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load


@query(
    "a05_route_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def a05_route_filter(spark: SparkSession, sf: str) -> DataFrame:
    """A5: route predicate dispatch as a filter branch
    (reference ``legacy-consumer.ts:92``); pushes to the parquet scan."""
    return (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "a08_fanout_explode",
    oracle="""
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def a08_fanout_explode(spark: SparkSession, sf: str) -> DataFrame:
    """A8: one record → N messages via explode
    (reference ``legacy-producer.ts:39``), aggregated to token counts."""
    d = load(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "a11_envelope_enrich",
    oracle="""
    SELECT event_id,
           upper(substr(event_type, 1, 1)) || substr(event_type, 2) AS code,
           strftime(ts, '%Y-%m-%d %H:%M:%S') || 'Z' AS createdAt,
           'engine' AS appName
    FROM events
    """,
)
def a11_envelope_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """A11: envelope enrichment — code/createdAt/appName projection
    (reference ``legacy-producer.ts:36-48``; format §1.2)."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        upper_camel_col("event_type").alias("code"),
        F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit("Z")).alias(
            "createdAt"
        ),
        F.lit("engine").alias("appName"),
    )


@query(
    "a12_camel_norm",
    oracle="""
    SELECT doc_id,
           upper(substr(lang, 1, 1)) || substr(lang, 2)
           || upper(substr(source, 1, 1)) || substr(source, 2) AS code
    FROM documents
    """,
)
def a12_camel_norm(spark: SparkSession, sf: str) -> DataFrame:
    """A12: UpperCamelCase normalization of a separator-joined subject
    (reference ``helpers/index.ts:8-10``) — pure column expression,
    stays inside whole-stage codegen."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        upper_camel_col(F.concat_ws("_", "lang", "source")).alias("code"),
    )


@query(
    "a03_corrupt_drop",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3) ELSE props END AS payload
      FROM events),
    j AS (
      -- CASE guards evaluation: DuckDB does not short-circuit AND, so a
      -- bare json_extract on malformed input can throw at larger SFs
      SELECT event_id,
             CASE WHEN json_valid(payload)
                  THEN CAST(json_extract(payload, '$.k') AS BIGINT) END AS k
      FROM raw)
    SELECT event_id, k FROM j WHERE k IS NOT NULL
    """,
)
def a03_corrupt_drop(spark: SparkSession, sf: str) -> DataFrame:
    """A3: deserialize + silently drop corrupt records
    (reference ``helpers/index.ts:12-21``): every 10th payload is
    truncated to invalid JSON; ``from_json`` yields NULL → filtered."""
    e = load(spark, sf, "events").withColumn(
        "payload",
        F.when(F.col("event_id") % 10 == 0, F.substring("props", 1, 3)).otherwise(
            F.col("props")
        ),
    )
    parsed = e.withColumn("p", F.from_json("payload", "k bigint"))
    return (
        parsed.filter(F.col("p").isNotNull() & F.col("p.k").isNotNull())
        .select("event_id", F.col("p.k").alias("k"))
    )
