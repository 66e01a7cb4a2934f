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


def _camel_fold_ctes() -> str:
    """DuckDB mirror of :func:`envelope.upper_camel_col`'s separator
    fold, as CTEs over an ``inp(__s, ...)`` relation (round 9 — the
    seeded dirty corpus showed the old first-char-only oracle spelling
    silently assumed separator-free identifiers).

    The reference fold (``helpers/index.ts:8-10``) is a NON-OVERLAPPING
    regex scan: each ``[-_ ].`` match drops the separator and
    uppercases the consumed char, then scanning resumes AFTER the pair.
    Within a separator run of length k, that means separators at odd
    offsets start a match (dropped; the next char — possibly itself a
    separator, whose upper() is itself — is consumed) and a trailing
    odd-offset separator with nothing to consume survives. That parity
    rule is what the window computes: ``run_off`` = distance to the
    previous non-separator, over DISTINCT strings (duplicate input
    rows must not double the aggregated chars), keyed by the string
    itself (dirty data can carry two different strings per id).

    ASCII-identifier domain: the Kafka-facing subject columns this
    feeds (event names, topics, lang/source tags) are ASCII by the
    reference's own contract; full-Unicode case mapping is where the
    engines genuinely split (Java/JS ``'ß'.toUpperCase() == 'SS'``,
    DuckDB ``ẞ``) and is out of the oracle's stated domain.
    """
    return """
    strs AS (SELECT DISTINCT __s FROM inp WHERE __s IS NOT NULL),
    chars AS (
      SELECT __s, i, string_split(substr(__s, 2), '')[i] AS ch
      FROM strs,
           UNNEST(generate_series(
             1, GREATEST(COALESCE(len(__s), 1) - 1, 0))) AS g(i)),
    marked AS (
      SELECT __s, i, ch, (ch IN ('-', '_', ' ')) AS sep,
             MAX(CASE WHEN ch NOT IN ('-', '_', ' ') THEN i END)
               OVER (PARTITION BY __s ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_nonsep,
             MAX(i) OVER (PARTITION BY __s) AS last_i
      FROM chars),
    runs AS (
      SELECT __s, i, ch, sep,
             i - COALESCE(prev_nonsep, 0) AS run_off, last_i
      FROM marked),
    outc AS (
      SELECT __s, i,
             CASE
               WHEN NOT sep AND run_off > 1 AND (run_off - 1) % 2 = 1
                 THEN upper(ch)
               WHEN NOT sep THEN ch
               WHEN sep AND run_off % 2 = 0 THEN ch
               WHEN sep AND i = last_i THEN ch
               ELSE ''
             END AS o
      FROM runs),
    folded AS (
      SELECT s.__s,
             upper(substr(s.__s, 1, 1))
               || COALESCE(string_agg(o.o, '' ORDER BY o.i), '') AS __code
      FROM strs s LEFT JOIN outc o ON o.__s = s.__s
      GROUP BY s.__s)
    """


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
    oracle=f"""
    WITH inp AS (
      SELECT event_id, ts, event_type AS __s FROM events),
    {_camel_fold_ctes()}
    SELECT inp.event_id,
           f.__code AS code,
           strftime(inp.ts, '%Y-%m-%d %H:%M:%S') || 'Z' AS createdAt,
           'engine' AS appName
    FROM inp LEFT JOIN folded f ON f.__s = inp.__s
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
    oracle=f"""
    WITH inp AS (
      -- concat_ws semantics, spelled out: NULL operands are SKIPPED
      -- (with their separator), both-NULL joins to '' — unlike ||,
      -- which null-propagates (the b03 round-9 dirty-corpus lesson,
      -- here the skip IS the declared semantics: the reference joins
      -- only the subject parts that exist)
      SELECT doc_id,
             CASE
               WHEN lang IS NULL AND source IS NULL THEN ''
               WHEN lang IS NULL THEN source
               WHEN source IS NULL THEN lang
               ELSE lang || '_' || source
             END AS __s
      FROM documents),
    {_camel_fold_ctes()}
    SELECT inp.doc_id, f.__code AS code
    FROM inp LEFT JOIN folded f ON f.__s = inp.__s
    """,
)
def a12_camel_norm(spark: SparkSession, sf: str) -> DataFrame:
    """A12: UpperCamelCase normalization of a separator-joined subject
    (reference ``helpers/index.ts:8-10``) — pure column expression,
    stays inside whole-stage codegen. The oracle mirrors the full
    separator fold (see ``_camel_fold_ctes``); round 9 replaced the
    first-char-only spelling the dirty corpus exposed."""
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
