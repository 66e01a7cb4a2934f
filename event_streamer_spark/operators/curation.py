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

from event_streamer_spark.operators.pipeline import _EVAL_MOD
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
             ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                ORDER BY doc_id NULLS LAST,
                                         lang NULLS LAST,
                                         source NULLS LAST) AS rn
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
    # total survivor order: (doc_id, lang, source) — doc_id alone is
    # NOT total under the conflicting-duplicate class (seed-20260822
    # skew corpus: one copy of a duplicated row had its source
    # reassigned, and the rn=1 survivor's source became
    # engine-arbitrary). Null order pinned on EVERY key on BOTH sides
    # (ADVICE r10: Spark asc defaults NULLS FIRST, DuckDB bare ORDER BY
    # defaults NULLS LAST — latent today because doc_id is not in the
    # dirty-corpus _NULLABLE set, but a nullable-id class would make
    # the rn=1 survivor engine-arbitrary).
    w = Window.partitionBy("content_hash").orderBy(
        F.col("doc_id").asc_nulls_last(),
        F.col("lang").asc_nulls_last(),
        F.col("source").asc_nulls_last(),
    )
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


# -- deterministic stratified sampling ---------------------------------
# Hash-based Bernoulli sampling: keep a row iff the first 8 hex chars of
# md5(doc_id:lang) fall below the stratum's threshold. Fixed-width
# lowercase hex compares lexicographically == numerically, and both
# engines produce identical md5 hex — so the sample is reproducible
# across engines, runs, partitionings, and cluster sizes (unlike
# df.sample(), whose row set depends on partition layout). This is how a
# 100 TB pipeline pins "the 10% English slice" forever.
_EN_THRESHOLD = "1999999a"  # ~0.10 of 2^32
_OTHER_THRESHOLD = "80000000"  # ~0.50


def weighted_sample_key(id_col: str, weight_col: str) -> F.Column:
    """The A-ES priority u^(1/w), 6-decimal rounded: u is an md5-derived
    uniform (pure row function — no RNG state), w the weight column.
    Shared by the batch operator and the streaming incremental leg so
    their samples are bit-identical."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":ws"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return F.round(F.pow(u, 1.0 / F.col(weight_col)), 6)


@query(
    "d7_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 8) <
          CASE WHEN lang = 'en' THEN '{_EN_THRESHOLD}'
               ELSE '{_OTHER_THRESHOLD}' END
    """,
)
def d7_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: deterministic per-stratum sampling (downsample 'en' to ~10%,
    other languages to ~50%) via portable md5 hex-prefix thresholds.

    Scale: a pure narrow filter — no shuffle, no RNG state, pushdown-
    friendly; re-running on any cluster yields the identical row set.
    """
    d = load(spark, sf, "documents")
    key = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))),
        1,
        8,
    )
    thr = F.when(F.col("lang") == "en", _EN_THRESHOLD).otherwise(
        _OTHER_THRESHOLD
    )
    return d.filter(key < thr).select("doc_id", "lang")


@query(
    "d7_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars, sample_key
    FROM (
      SELECT doc_id, n_chars,
             ROUND(POW(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                 || ':ws'), 1, 8) AS UBIGINT)
                            AS DOUBLE) / 4294967296.0,
                       1.0 / n_chars), 6) AS sample_key
      FROM documents WHERE n_chars > 0)
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
)
def d7_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc gets priority u^(1/w) with
    u = md5-derived uniform and w = its weight (n_chars here — longer
    docs proportionally likelier); the global top-k by priority IS a
    weighted sample without replacement.

    Scale: one narrow pass computing the priority (no RNG state — the
    md5 uniform is a pure function of the row, so the sample is
    identical across runs, partitionings, and engines) +
    TakeOrderedAndProject for the top-k: no shuffle of the table, no
    driver state. The 6-decimal rounded priority is the sort key on
    BOTH engines, so cross-engine libm differences (≤1 ulp in pow)
    cannot flip the ordering; ties break on doc_id.
    """
    # A-ES is defined for weights > 0 (round-10 hostile corpus: a
    # zero weight is a 1/w division by zero, a negative one a
    # priority > 1) — out-of-domain rows are excluded on both engines
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0)
    key = weighted_sample_key("doc_id", "n_chars")
    return (
        d.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(100)
    )


@query(
    "d7_grouped_weighted_sample",
    oracle="""
    SELECT lang, doc_id, sample_key, rn
    FROM (
      SELECT lang, doc_id, sample_key,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY sample_key DESC, doc_id) AS rn
      FROM (
        SELECT lang, doc_id,
               ROUND(POW(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                   || ':ws'), 1, 8) AS UBIGINT)
                              AS DOUBLE) / 4294967296.0,
                         1.0 / n_chars), 6) AS sample_key
        FROM documents WHERE n_chars > 0))
    WHERE rn <= 5
    ORDER BY lang, rn
    """,
)
def d7_grouped_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: per-stratum weighted sampling — top-5 A-ES priorities within
    each language. The per-group top-k runs through the DISTRIBUTED
    two-level decomposition (``distrank.two_level_row_number`` bucketed
    on the negated priority with ``rn_limit``), not a naive
    per-language window: ``lang`` is low-cardinality, so the naive plan
    sorts n/|langs| rows on one task at scale. Exercises the two-level
    machinery on a computed DESC ordering (b15 covers the fact-table
    case) under a full SQL oracle.
    """
    from event_streamer_spark.operators.distrank import two_level_row_number

    # same w > 0 A-ES domain as d7_weighted_sample (round 10)
    d = load(spark, sf, "documents").filter(F.col("n_chars") > 0).select(
        "lang",
        "doc_id",
        weighted_sample_key("doc_id", "n_chars").alias("sample_key"),
    )
    ranked = two_level_row_number(
        d,
        ["lang"],
        [F.desc("sample_key"), "doc_id"],
        bucket_value=-F.col("sample_key"),
        out_col="rn",
        rn_limit=5,
        mode="auto",  # size-aware: naive below the local threshold
    )
    return ranked.select("lang", "doc_id", "sample_key", "rn").orderBy(
        "lang", "rn"
    )


@query(
    "d7_pii_mask",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS name_hash,
           CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bucket,
           c_nationkey,
           c_mktsegment
    FROM customer
    """,
)
def d7_pii_mask(spark: SparkSession, sf: str) -> DataFrame:
    """D7: PII-safe projection — irreversibly hash direct identifiers
    (sha256 name), generalize quasi-identifiers (account balance → $1k
    bucket), keep analytic columns. Per-row scalar ops only: narrow,
    codegen-fused, no shuffle."""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.sha2("c_name", 256).alias("name_hash"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("bigint")
        .alias("acctbal_bucket"),
        "c_nationkey",
        "c_mktsegment",
    )


_SHUFFLE_SEED = "epoch0"


@query(
    "d12_corpus_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5('{_SHUFFLE_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents)
    SELECT doc_id, hk,
           ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS shuffle_pos
    FROM h
    """,
)
def d12_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """D12: deterministic corpus shuffle — the training-order
    permutation every pretraining epoch needs. Each doc's shuffle key is
    ``md5(seed | doc_id)`` (seeded, reproducible, engine-agnostic) and
    its position is the GLOBAL rank of that key.

    The global rank is the hard part at 100 TB: a naive
    ``row_number() OVER (ORDER BY hk)`` sorts the corpus on ONE task.
    Here it runs through ``distrank.two_level_row_number`` with a
    constant partition key — range-bucket on the key's numeric prefix,
    rank within buckets in parallel, add broadcast bucket offsets —
    i.e. a TeraSort-shaped distributed permutation. The md5 prefix is
    uniform, so the ~32 range buckets are balanced by construction.
    """
    from event_streamer_spark.operators.distrank import two_level_row_number

    d = (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.md5(
                F.concat(
                    F.lit(f"{_SHUFFLE_SEED}|"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("hk"),
        )
        .withColumn("__g", F.lit(0))
    )
    ranked = two_level_row_number(
        d,
        ["__g"],
        ["hk", "doc_id"],
        bucket_value=F.conv(F.substring("hk", 1, 8), 16, 10).cast("long"),
        out_col="shuffle_pos",
        mode="auto",  # size-aware: naive below the local threshold
    )
    return ranked.select(
        "doc_id", "hk", F.col("shuffle_pos").cast("long").alias("shuffle_pos")
    )


@query(
    "d6_source_report",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, source, sha256(text) AS content_hash,
             len(string_split(text, ' ')) AS n_toks
      FROM documents),
    contaminated AS (
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      grams AS (
        SELECT doc_id,
               array_to_string(list_slice(toks, i, i + 4), ' ') AS g
        FROM t, UNNEST(range(1, len(toks) - 3)) AS u(i)
        WHERE len(toks) >= 5),
      eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0)
      SELECT DISTINCT g2.doc_id
      FROM (SELECT DISTINCT doc_id, g FROM grams
            WHERE doc_id % {_EVAL_MOD} <> 0) g2
      JOIN eval_grams ON g2.g = eval_grams.g)
    SELECT h.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h.content_hash) AS BIGINT) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT h.content_hash) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate,
           CAST(SUM(h.n_toks) AS BIGINT) AS total_tokens,
           CAST(MAX(h.n_toks) AS BIGINT) AS max_tokens,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated
    FROM hashed h LEFT JOIN contaminated c ON h.doc_id = c.doc_id
    GROUP BY h.source
    """,
)
def d6_source_report(spark: SparkSession, sf: str) -> DataFrame:
    """D6: the per-source data-quality report a corpus owner reads
    before mixing — per source: doc count, exact-unique count and dup
    rate, token volume, and how many docs leak benchmark 5-grams
    (the `d8_decontaminate` predicate).

    Scale shape: one sha2 groupBy per source (map-side combinable), the
    decontamination leg reuses the uniform gram-hash shuffle, and the
    final per-source rollup is k-rows output. The kind of composition
    a 100 TB pipeline runs nightly — every stage is an aggregate or a
    broadcast-sized join, nothing driver-side.
    """
    from event_streamer_spark.operators.pipeline import _decon_grams

    docs = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.sha2("text", 256).alias("content_hash"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    train_pairs, eval_grams = _decon_grams(spark, sf)
    contaminated = (
        train_pairs.distinct()
        .join(eval_grams, "g")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    return (
        docs.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("content_hash").cast("bigint").alias("n_unique"),
            F.round(
                F.lit(1.0)
                - F.countDistinct("content_hash").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.max("n_toks").cast("bigint").alias("max_tokens"),
            F.count("is_cont").cast("bigint").alias("n_contaminated"),
        )
    )


@query(
    "d7_winsorize",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL),
    r AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM d),
    b AS (
      SELECT
        MIN(CASE WHEN rn = GREATEST(1, (5 * n + 99) // 100)
                 THEN n_chars END) AS lo,
        MIN(CASE WHEN rn = GREATEST(1, (95 * n + 99) // 100)
                 THEN n_chars END) AS hi
      FROM r)
    SELECT d.doc_id, d.n_chars,
           CAST(LEAST(GREATEST(d.n_chars, b.lo), b.hi) AS BIGINT)
             AS w_chars
    FROM d CROSS JOIN b
    """,
)
def d7_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """D7: exact winsorization — clip every document's length feature
    to the exact [p05, p95] of the corpus, the standard outlier
    treatment before scaling/training. The percentile is the explicit
    RANK definition rank_p = max(1, ⌈p·n⌉), computed in INTEGER
    arithmetic ((p·n + 99) DIV 100) with a (value, doc_id) total
    order — not an engine quantile builtin, whose rank conventions
    (disc/cont, 0- or 1-based) differ and are not oracle-able.

    Scale: the global rank is the d12 TeraSort shape via distrank
    ``auto`` (range-bucketed two-level above the size threshold, never
    a single-task sort); the two boundary rows collapse to a 1-row
    broadcast that clips the corpus in one map-side pass. NULL
    features are excluded explicitly on both engines (dirty fixture
    rows carry them).
    """
    from event_streamer_spark.operators.distrank import (
        two_level_row_number,
    )

    d = (
        load(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull())
        .withColumn("__g", F.lit(0))
    )
    ranked = two_level_row_number(
        d,
        ["__g"],
        ["n_chars", "doc_id"],
        bucket_value="n_chars",
        out_col="rn",
        count_col="n",
        mode="auto",  # size-aware: naive below the local threshold
    )
    bounds = ranked.select(
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr("(5 * n + 99) DIV 100")),
                F.col("n_chars"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr("(95 * n + 99) DIV 100")),
                F.col("n_chars"),
            )
        ).alias("hi"),
    )
    return (
        d.select("doc_id", "n_chars")
        .crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "n_chars",
            F.least(
                F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi")
            ).cast("bigint").alias("w_chars"),
        )
    )
