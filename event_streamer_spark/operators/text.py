"""Text analysis operators (SURVEY §2.C D4) over the documents table.

All hot-path metrics are pure column expressions (JVM-side, codegen);
the rolling-hash fingerprint is the one pandas-UDF (Arrow-batched).
Everything is embarrassingly parallel — no shuffle except final
aggregations, so the operators scale linearly to 100 TB.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# language → marker words for the n-gram/stopword language-ID heuristic
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "les", "des", "et"),
    "de": ("der", "die", "das", "und"),
    "zh": ("de5", "shi4", "le5", "bu4"),  # romanized placeholders
}


@query(
    "d4_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           n_chars
    FROM documents
    """,
)
def d4_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """D4: whitespace tokenization count + char counts."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        "n_chars",
    )


@query(
    "d4_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
             AS n_punct_tokens
    FROM documents
    """,
)
def d4_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """D4: BPE-style pre-tokenizer count — the GPT-2-family pre-tokenizer
    splits runs of letters, runs of digits, and individual punctuation
    into separate tokens before merges; counting those units estimates
    the post-BPE token budget far better than whitespace counting
    (numbers and punctuation dominate the difference).

    One regexp per row, JVM-side (``regexp_extract_all``), zero shuffle
    — a token-budget pass over 100 TB is scan-bound.
    """
    d = load(spark, sf, "documents")
    pat_all = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat_all), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0))
        .cast("bigint")
        .alias("n_numbers"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9 ]"), 0))
        .cast("bigint")
        .alias("n_punct_tokens"),
    )


@query(
    "d4_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           ROUND(CAST(len(list_filter(toks, x -> x IN {_STOPWORDS!r})) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 6)
             AS mean_word_len,
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT)
             AS n_punct
    FROM t
    """,
)
def d4_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """D4: quality signals — stopword ratio, mean word length, punct count.

    All JVM-side expressions; a quality filter at 100 TB is a narrow map
    stage with zero shuffle.
    """
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    return d.select(
        "doc_id",
        F.round(
            F.expr(f"size(filter(toks, x -> x IN ({stop_list})))").cast("double")
            / F.size("toks"),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size("toks"),
            6,
        ).alias("mean_word_len"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
        ).cast("bigint").alias("n_punct"),
    )


def _langid_case_sql() -> tuple[str, str]:
    """Build (duckdb_sql, spark_score_exprs) for the marker-vote heuristic."""
    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        score_cols.append((lang, f"len(list_filter(toks, x -> x IN ({lst})))"))
    # argmax with fixed preference order (dict order) on ties
    case = "CASE "
    langs = [lang for lang, _ in score_cols]
    for i, lang in enumerate(langs):
        others = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        prior = [f"s_{lang} > s_{other}" for other in langs[:i]]
        conds = prior + others
        cond = " AND ".join(conds) if conds else "TRUE"
        case += f"WHEN {cond} THEN '{lang}' "
    case += "ELSE 'und' END"
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score_cols)
    return scores_sql, case


@query(
    "d4_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_langid_case_sql()[0]} FROM t)
    SELECT doc_id, lang AS labeled_lang, {_langid_case_sql()[1]} AS predicted_lang
    FROM s
    """,
)
def d4_langid(spark: SparkSession, sf: str) -> DataFrame:
    """D4: language ID via stopword-marker votes (deterministic argmax with
    fixed preference order on ties). A real model would be a pandas UDF;
    the heuristic keeps the oracle SQL-expressible."""
    d = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    scored = d
    for lang, markers in _LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        scored = scored.withColumn(
            f"s_{lang}", F.expr(f"size(filter(toks, x -> x IN ({lst})))")
        )
    langs = list(_LANG_MARKERS)
    pred = F.lit("und")
    # build the same fixed-preference argmax, innermost-first
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = F.lit(True)
        for other in langs[:i]:
            cond = cond & (F.col(f"s_{lang}") > F.col(f"s_{other}"))
        for other in langs[i + 1 :]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred) if i < len(langs) - 1 else (
            F.when(cond, F.lit(lang)).otherwise(pred)
        )
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


def fingerprint_frame(spark: SparkSession, sf: str) -> DataFrame:
    """``(doc_id, fingerprint)`` raw frame — the registered
    ``d4_fingerprint`` wraps it in the round-10 equivalence check;
    tests call this directly.

    fp = Σ (crc32(tok_i)+1) · B^i  (mod p) — order-sensitive, so
    reordered documents get different fingerprints (unlike
    bag-of-words hashes). The +1 keeps every token's contribution
    nonzero: crc32('') = 0, so without it every whitespace-only
    document collapsed to fingerprint 0 regardless of length — a
    distinct-texts-merged divergence found by the round-10 hostile
    corpus (docs ``''`` and ``' '`` fingerprinted equal).
    Deterministic; Arrow-batched pandas UDF.
    """
    P = (1 << 61) - 1
    B = 1_000_003

    @pandas_udf("long")
    def fingerprint(texts: pd.Series) -> pd.Series:
        # NULL text → NULL fingerprint (round-9 dirty corpus: a None
        # in the Arrow batch crashed .split and killed the task)
        out: list = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            acc, power = 0, 1
            for tok in text.split(" "):
                acc = (acc + (zlib.crc32(tok.encode()) + 1) * power) % P
                power = (power * B) % P
            out.append(acc)
        return pd.Series(out, dtype="Int64")

    d = load(spark, sf, "documents")
    return d.select("doc_id", "text", fingerprint("text").alias("fingerprint"))


@query(
    "d4_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS n_same_fp
    FROM documents WHERE text IS NOT NULL
    """,
)
def d4_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """D4: rolling-hash fingerprint, registered as an EQUIVALENCE-CLASS
    oracle query (round-10 upgrade from rows-only — stronger than a
    bounded boolean: every row hash-checks): each doc reports the size
    of its FINGERPRINT equivalence class, the oracle reports the size
    of its TEXT equivalence class. The multiset of (doc_id, class
    size) matches iff the fingerprint neither splits equal texts
    (determinism/stability bug) nor merges distinct ones (a 61-bit
    collision or a broken mix) — both directions of the fingerprint
    contract, checked per row on whatever corpus is replayed. NULL
    text is outside the domain on both engines.
    """
    from pyspark.sql import Window

    fp = fingerprint_frame(spark, sf).filter(F.col("text").isNotNull())
    return fp.select(
        "doc_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("fingerprint"))
        .cast("bigint")
        .alias("n_same_fp"),
    )


@query(
    "d4_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def d4_token_count_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """D4: BPE-style pre-tokenization count — a GPT-2-ish splitter
    (letter runs | digit runs | single punctuation) vs plain whitespace.
    Pure regexp column expression; the count proxies LLM token budgets
    without shipping a tokenizer model."""
    d = load(spark, sf, "documents")
    # pattern passed as a Column literal — an F.expr SQL string would
    # swallow the backslash in \s
    pat = F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), pat, F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
    )


# Fixed segment length for the length-robust windowed TTR (plain TTR
# falls with document length as vocabulary saturates).
_TTR_SEG = 50


@query(
    "d4_lexical_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i AS pos, t.toks[i] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents) t,
           UNNEST(range(1, len(t.toks) + 1)) AS u(i)),
    seg AS (
      SELECT doc_id, (pos - 1) // {_TTR_SEG} AS s,
             COUNT(*) AS n, COUNT(DISTINCT tok) AS u
      FROM toks GROUP BY doc_id, (pos - 1) // {_TTR_SEG}),
    overall AS (
      SELECT doc_id, COUNT(*) AS n_toks, COUNT(DISTINCT tok) AS n_types
      FROM toks GROUP BY doc_id)
    SELECT o.doc_id,
           CAST(o.n_toks AS BIGINT) AS n_toks,
           ROUND(CAST(o.n_types AS DOUBLE) / o.n_toks, 6) AS ttr,
           ROUND(AVG(CAST(seg.u AS DOUBLE) / seg.n), 6) AS seg_ttr
    FROM overall o JOIN seg ON seg.doc_id = o.doc_id
    GROUP BY o.doc_id, o.n_toks, o.n_types
    """,
)
def d4_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """D4: lexical diversity — type-token ratio plus the
    fixed-segment (50-token) mean TTR that stays comparable across
    document lengths (plain TTR decays as a doc exhausts its
    vocabulary; segment averaging is the standard correction, the
    MTLD family's cheap sibling). Low diversity flags boilerplate and
    template spam that pass the stopword/length filters.

    Shape: ONE explode — the token frame is ``bounded_persist``-ed
    because both aggregates read it (review r8 #4: unpersisted,
    Catalyst inlines the scan+split+explode subtree into each) — then
    two map-combinable aggregates (the COUNT DISTINCT is Spark's
    standard two-stage expand) and one co-partitioned join on doc_id.
    Ratios divide exact integers; the segment mean averages ≤ len/50
    per-doc DOUBLE terms and rounds at the repo grain — the one float
    mean in the family, following the unigram-logprob precedent
    (cross-regime stability pinned by the metamorphic suite for that
    class).
    """
    from event_streamer_spark.caching import bounded_persist

    toks = bounded_persist(
        load(spark, sf, "documents").select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        ),
        "text.ttr_toks",
    )
    seg = toks.groupBy(
        "doc_id", (F.col("pos") / _TTR_SEG).cast("long").alias("s")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("tok").alias("u"),
    )
    overall = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.countDistinct("tok").alias("n_types"),
    )
    return (
        overall.join(seg, "doc_id")
        .groupBy("doc_id", "n_toks", "n_types")
        .agg(
            F.round(
                F.avg(F.col("u").cast("double") / F.col("n")), 6
            ).alias("seg_ttr")
        )
        .select(
            "doc_id",
            F.col("n_toks").cast("long"),
            F.round(
                F.col("n_types").cast("double") / F.col("n_toks"), 6
            ).alias("ttr"),
            "seg_ttr",
        )
    )
