"""Pretraining-pipeline operators (SURVEY §2.C D7/D8 extensions):
benchmark decontamination, mixture rebalancing, unicode normalization.

These are the corpus-construction steps published pipeline reports run
at scale (n-gram decontamination as in the GPT-3/Llama appendices;
source-mixture rebalancing; NFC normalization before tokenization).
The reference has none of them — they are north-star D-surface ops.

Scale posture: decontamination shuffles on the n-gram hash (uniform);
mixture sampling is one tiny aggregate broadcast into a narrow filter;
normalization is a narrow Arrow-batched map. No driver state anywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_DECON_GRAM = 5  # tokens per overlap gram
# doc_id % mod == 0 → held-out "benchmark" doc. 10 (not the original
# 97): at mod 97 the 1% eval slice happened to contain NO near-dup
# partner at sf0.01, making d8_decontaminate_neardup vacuously empty at
# a gate SF (round-9 verdict nit); a 10% held-out slice crosses 6/10/47
# near-dup pairs at sf0.01/0.001/0.1, so all three decon legs return
# rows at every gate SF.
_EVAL_MOD = 10

# Both decontamination variants (exact shuffle join / Bloom-pruned) are
# EXACT — same answer, different physical strategy — so they share one
# oracle.
_D8_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    grams AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, i, i + {_DECON_GRAM} - 1), ' ')
               AS g
      FROM t, UNNEST(range(1, len(toks) - {_DECON_GRAM} + 2)) AS u(i)
      WHERE len(toks) >= {_DECON_GRAM}),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0),
    train AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % {_EVAL_MOD} <> 0)
    SELECT train.doc_id,
           COUNT(*) AS n_shared_grams
    FROM train JOIN eval_grams ON train.g = eval_grams.g
    GROUP BY train.doc_id
    """


def explode_grams(
    docs: DataFrame,
    gram: int = _DECON_GRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, g)`` rows of overlapping ``gram``-token n-grams — THE one
    gram definition every decontamination path shares (batch exact,
    batch Bloom-pruned, and both streaming legs in ``streaming/ops``),
    so a tokenizer/boundary change cannot silently diverge between the
    tested-equal variants."""
    t = docs.withColumn("toks", F.split(text_col, " ")).filter(
        F.size("toks") >= gram
    )
    return t.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {gram} + 1),"
                f" i -> concat_ws(' ', slice(toks, i, {gram})))"
            )
        ).alias("g"),
    )


def _decon_grams(spark: SparkSession, sf: str):
    """Shared gram dataflow for the D8 variants: ``(train_pairs,
    eval_grams)`` where ``train_pairs`` is the PRE-distinct (doc_id, g)
    stream and ``eval_grams`` the distinct held-out gram set."""
    grams = explode_grams(load(spark, sf, "documents"))
    eval_grams = (
        grams.filter(F.col("doc_id") % _EVAL_MOD == 0).select("g").distinct()
    )
    train_pairs = grams.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        "doc_id", "g"
    )
    return train_pairs, eval_grams


@query("d8_decontaminate", oracle=_D8_ORACLE)
def d8_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """D8: benchmark decontamination — flag training docs sharing any
    overlapping {5}-token gram with the held-out eval slice
    (doc_id % _EVAL_MOD == 0), reporting how many distinct grams leak.

    The published recipe (exact n-gram collision against benchmarks,
    GPT-3 appx C / Llama 2 appx A.6) as one dataflow: explode
    overlapping grams, split eval/train by the deterministic holdout
    predicate, distinct, and join on the gram. The join shuffles on the
    gram string (uniform hash, skew-free); eval grams are benchmark-
    sized, so AQE broadcasts them at real scale.
    """
    train_pairs, eval_grams = _decon_grams(spark, sf)
    return (
        train_pairs.distinct()
        .join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# -- Bloom-pruned decontamination (the 100 TB physical strategy) -------
#
# d8_decontaminate's scale cost is the `train.distinct()` + join: EVERY
# training gram crosses the wire once to be deduplicated and matched.
# At 100 TB that is the dominant shuffle of the whole pipeline, yet
# ~all grams match nothing. A Bloom filter over the (benchmark-sized)
# eval grams, built relationally and broadcast as one array<long> row,
# rejects non-colliding grams MAP-SIDE before any exchange; survivors
# (true collisions + the α false-positive sliver) are exact-verified by
# the original join, so the answer is bit-identical — same oracle.

# The generic bitmap/probe primitive lives in event_streamer_spark.bloom
# (shared with skew.bloom_prune_join and streaming Bloom pruning);
# re-exported here for existing callers.
from event_streamer_spark.bloom import (  # noqa: E402,F401
    bloom_bitmap,
    bloom_might_contain,
)


@query("d8_decontaminate_bloom", oracle=_D8_ORACLE)
def d8_decontaminate_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """D8 (scale path): Bloom-pruned benchmark decontamination —
    EXACTLY the `d8_decontaminate` answer (shared oracle), with the
    train-side shuffle pruned map-side by a broadcast 32 KiB Bloom
    bitmap over the eval grams.

    Physical story: the bitmap build touches only eval grams (benchmark-
    sized); training grams are filtered BEFORE the distinct, so only
    true collisions plus an ~α false-positive sliver ever reach an
    exchange; the surviving grams are exact-verified by the original
    join, cancelling the false positives. Bloom filters have no false
    negatives, so no collision is lost (asserted against
    `d8_decontaminate` in tests/test_dedup_quality.py).
    """
    train_pairs, eval_grams = _decon_grams(spark, sf)
    bitmap = bloom_bitmap(eval_grams)
    pruned = (
        train_pairs.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain())
        .drop("bloom")
        .distinct()
    )
    return (
        pruned.join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# Fuzzy decontamination: exact-gram overlap misses PARAPHRASED leaks —
# a benchmark answer reworded keeps most of its 3-gram shingles but few
# exact 5-grams. Flag train docs whose shingle Jaccard against ANY
# held-out doc clears this threshold.
_NEARDUP_DECON_JACCARD = 0.3


def _neardup_decon_oracle() -> str:
    from event_streamer_spark.operators.dedup import shingle_ctes

    return f"""
    WITH {shingle_ctes()},
    tr AS (SELECT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} != 0),
    ev AS (SELECT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} = 0),
    inter AS (
      SELECT a.doc_id AS t, b.doc_id AS e, COUNT(*) AS cnt
      FROM tr a JOIN ev b ON a.s = b.s GROUP BY 1, 2),
    jac AS (
      SELECT i.t, i.e,
             CAST(i.cnt AS DOUBLE) / (st.n + se.n - i.cnt) AS j
      FROM inter i
      JOIN sizes st ON st.doc_id = i.t
      JOIN sizes se ON se.doc_id = i.e)
    SELECT t AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminating,
           ROUND(MAX(j), 6) AS best_jaccard
    FROM jac WHERE j >= {_NEARDUP_DECON_JACCARD}
    GROUP BY t
    """


@query("d8_decontaminate_neardup", oracle=_neardup_decon_oracle())
def d8_decontaminate_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """D8 (fuzzy leg): near-duplicate decontamination — train docs
    whose 3-gram shingle Jaccard against ANY held-out doc reaches the
    threshold, with the count of contaminating benchmarks and the
    worst overlap.

    Exact-gram decontamination (``d8_decontaminate``) misses
    paraphrased leaks; this leg reuses the DF-capped shingle machinery
    from the near-dup family (``dedup.shingle_sets`` — no shingle key
    carries more than 256 rows into the cross-corpus join, so a
    boilerplate trigram cannot go quadratic against the benchmark
    side). The held-out side is benchmark-sized: the join's right side
    is small by construction, and at 100 TB the same Bloom pre-prune
    as ``d8_decontaminate_bloom`` applies upstream. Jaccard uses the
    capped shingle sets on BOTH engines, keeping the metric
    definitionally identical to ``d2_ngram_jaccard``. The shingle
    frame feeds four consumers (sizes + both corpus sides), so it is
    ``bounded_persist``-ed — each unpersisted reference re-runs the
    shingle explode and DF-cap anti-join (plan-audited: 16 parquet
    scans → 4).
    """
    from event_streamer_spark.operators.dedup import capped_shingles

    # r13: share the near-dup family's canonical persisted shingle frame
    # (one slot, one build) instead of a private copy — see
    # dedup.capped_shingles
    shingles = capped_shingles(spark, sf)
    sizes = shingles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    tr = shingles.filter(F.col("doc_id") % _EVAL_MOD != 0)
    ev = shingles.filter(F.col("doc_id") % _EVAL_MOD == 0)
    inter = (
        tr.alias("a")
        .join(ev.alias("b"), F.col("a.s") == F.col("b.s"))
        .groupBy(
            F.col("a.doc_id").alias("t"), F.col("b.doc_id").alias("e")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = sizes.select(F.col("doc_id").alias("t"), F.col("n").alias("nt"))
    se = sizes.select(F.col("doc_id").alias("e"), F.col("n").alias("ne"))
    jac = F.col("cnt").cast("double") / (
        F.col("nt") + F.col("ne") - F.col("cnt")
    )
    return (
        inter.join(st, "t")
        .join(se, "e")
        .filter(jac >= _NEARDUP_DECON_JACCARD)
        .groupBy(F.col("t").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_contaminating"),
            F.round(F.max(jac), 6).alias("best_jaccard"),
        )
    )


def md5_threshold(rate_col: F.Column) -> F.Column:
    """Fixed-width lowercase-hex keep threshold for a [0, 1] rate — the
    shared primitive behind every deterministic hash sampler here
    (uniform mixture, temperature, and the streaming leg): a row is
    kept iff the first 8 md5 hex chars of its salted key sort below
    this. 'g' sorts above every hex digit, so rate >= 1 keeps all; the
    2^32-1 clamp keeps a rate a few ulps under 1.0 at 8 digits."""
    return F.when(rate_col >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(
                F.hex(
                    F.least(
                        F.floor(rate_col * F.lit(4294967296.0)).cast("bigint"),
                        F.lit(4294967295),
                    )
                )
            ),
            8,
            "0",
        )
    )


@query(
    "d7_mixture_sample",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS k FROM counts),
    rates AS (
      SELECT source,
             LEAST(1.0, (CAST(n AS DOUBLE) / k) / c) AS rate
      FROM counts CROSS JOIN tot),
    thr AS (
      -- clamp to 2^32-1: a rate a few ulps under 1.0 can round up to
      -- exactly 2^32, whose 9-hex-digit form lpad would truncate
      SELECT source, rate,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(to_hex(LEAST(CAST(FLOOR(rate * 4294967296.0)
                                               AS BIGINT),
                                          4294967295))), 8, '0') END AS h
      FROM rates)
    SELECT d.doc_id, d.source, ROUND(thr.rate, 6) AS rate
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || d.source), 1, 8)
          < thr.h
    """,
)
def d7_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: source-mixture rebalancing — deterministic downsampling so
    every source contributes ~equally (rate_s = min(1, (N/k)/count_s)).

    One tiny per-source aggregate (k rows) computes the rates, is
    broadcast back, and the sample itself is a narrow md5-threshold
    filter — identical row set on any cluster, no RNG state, no second
    pass over the data. The same dataflow takes arbitrary target
    weights in place of the uniform 1/k.
    """
    d = load(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0), (F.col("n").cast("double") / F.col("k")) / F.col("c")
        ).alias("rate"),
    )
    thr = rates.select(
        "source", "rate", md5_threshold(F.col("rate")).alias("h")
    )
    key = F.substring(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("source"))
        ),
        1,
        8,
    )
    return (
        d.join(F.broadcast(thr), "source")
        .filter(key < F.col("h"))
        .select("doc_id", "source", F.round("rate", 6).alias("rate"))
    )


@query(
    "d4_unicode_normalize",
    oracle="""
    SELECT doc_id,
           nfc_normalize(replace(substr(text, 1, 40), 'e', 'e' || chr(769)))
             AS norm_prefix,
           CAST(length(nfc_normalize(replace(substr(text, 1, 40),
                                             'e', 'e' || chr(769)))) AS BIGINT)
             AS n_norm_chars
    FROM documents
    """,
)
def d4_unicode_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """D4: unicode NFC normalization (pre-tokenization hygiene).

    The fixture text is ASCII, so the query first decomposes it
    (every 'e' gains a combining acute, U+0301) and then normalizes —
    proving real NFC composition ('e'+U+0301 → U+00E9) against DuckDB's
    ``nfc_normalize``. Spark has no built-in normalizer, so this is an
    Arrow-batched ``unicodedata`` UDF over a 40-char prefix — a narrow
    map stage; at scale the UDF cost is the tokenizer's input pass.
    """

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        # NULL text → NULL (round-9 dirty corpus)
        return texts.map(
            lambda s: unicodedata.normalize("NFC", s)
            if s is not None
            else None
        )

    d = load(spark, sf, "documents").withColumn(
        "decomposed",
        # the replacement is DECOMPOSED: 'e' + combining acute U+0301
        F.regexp_replace(F.substring("text", 1, 40), "e", "é"),
    )
    # one UDF invocation; the length derives from the aliased result so
    # the batch crosses the Arrow boundary once
    out = d.select("doc_id", nfc("decomposed").alias("norm_prefix"))
    return out.select(
        "doc_id",
        "norm_prefix",
        F.length("norm_prefix").cast("bigint").alias("n_norm_chars"),
    )


_PACK_BUDGET = 512  # tokens per packed training sequence
_PACK_RANGE = 1000  # doc_ids per prefix-sum range (bounds window size)


def exclusive_prefix_sum(
    df: DataFrame,
    key_col: str,
    val_col: str,
    out_col: str = "prefix",
    fanout: int = _PACK_RANGE,
) -> DataFrame:
    """Distributed exclusive prefix sum of ``val_col`` in ``key_col``
    order (integer keys), as a three-level scan with NO unpartitioned
    window anywhere in the plan: rows cumsum within bounded ranges
    (window over key ÷ fanout, partitioned), range totals cumsum within
    super-ranges (÷ fanout² — n/fanout rows, partitioned), and only the
    super-range totals (n/fanout² rows: 10⁴ at 10¹⁰ rows with the
    default fanout) take an ordered scan on an explicit single-partition
    key — a declared, bounded one-task stage, not a silent global sort.
    The bases table (n/fanout rows) joins back on the range key WITHOUT
    a forced broadcast: the big side already hash-partitions on ``rng``
    from its window, so the join reuses that exchange at scale while AQE
    still broadcasts the small side at test SFs. Keys may be sparse or
    duplicated; ties cumsum in arbitrary order within the key, exactly
    like an ORDER BY key ROWS UNBOUNDED PRECEDING scan.
    """
    from pyspark.sql import Window

    t = df.withColumn("__rng", (F.col(key_col) / fanout).cast("bigint"))
    in_range = Window.partitionBy("__rng").orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    within = t.withColumn(
        "__local", F.sum(val_col).over(in_range) - F.col(val_col)
    )
    range_totals = t.groupBy("__rng").agg(
        F.sum(val_col).alias("__rt")
    ).withColumn("__rng2", (F.col("__rng") / fanout).cast("bigint"))
    in_super = Window.partitionBy("__rng2").orderBy("__rng").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    within_super = range_totals.withColumn(
        "__local_base", F.sum("__rt").over(in_super) - F.col("__rt")
    )
    super_totals = range_totals.groupBy("__rng2").agg(F.sum("__rt").alias("__st"))
    # the partition key must not be foldable (Catalyst drops constant
    # partition exprs, reintroducing the unpartitioned-window warning) —
    # rng2*0 is 0 for every row but survives optimization
    top = Window.partitionBy(F.col("__rng2") * 0).orderBy("__rng2").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    super_bases = super_totals.withColumn(
        "__super_base", F.sum("__st").over(top) - F.col("__st")
    ).select("__rng2", "__super_base")
    bases = within_super.join(F.broadcast(super_bases), "__rng2").select(
        "__rng",
        (F.col("__super_base") + F.col("__local_base")).alias("__base"),
    )
    return (
        within.join(bases, "__rng")
        .withColumn(out_col, F.col("__base") + F.col("__local"))
        .drop("__rng", "__local", "__base")
    )



@query(
    "d9_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS prefix
      FROM t)
    SELECT doc_id, n_tokens,
           CAST(prefix // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST(prefix % {_PACK_BUDGET} AS BIGINT) AS bin_offset
    FROM c
    """,
)
def d9_sequence_pack(spark: SparkSession, sf: str) -> DataFrame:
    """D9: sequence packing — concatenate the doc stream in doc_id order
    and chunk it into {512}-token training sequences; each doc gets the
    bin it starts in and its token offset within that bin (concat-and-
    chunk packing, the standard pretraining batch-prep step).

    The exclusive prefix sum is :func:`exclusive_prefix_sum` — the
    three-level distributed scan (see its docstring for the scale
    argument). Integer arithmetic end-to-end, so the decomposition is
    exactly the oracle's global scan.
    """
    t = load(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    packed = exclusive_prefix_sum(t, "doc_id", "n_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        (F.col("prefix") / _PACK_BUDGET).cast("bigint").alias("bin_id"),
        (F.col("prefix") % _PACK_BUDGET).cast("bigint").alias("bin_offset"),
    )


_CHUNK_TOKENS = 32
_CHUNK_OVERLAP = 8
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


@query(
    "d9_chunk_overlap",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    st AS (SELECT doc_id, t,
                  unnest(range(1, greatest(len(t) - {_CHUNK_OVERLAP}, 1) + 1,
                               {_CHUNK_STRIDE})) AS s
           FROM tok)
    SELECT doc_id,
           CAST(s AS BIGINT) AS start,
           CAST(len(t[s : s + {_CHUNK_TOKENS - 1}]) AS BIGINT) AS n_tok,
           md5(array_to_string(t[s : s + {_CHUNK_TOKENS - 1}], ' '))
             AS chunk_hash
    FROM st
    """,
)
def d9_chunk_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """D9: overlapping document chunking — the passage-window primitive
    of RAG indexing and long-document pretraining prep: windows of 32
    tokens at stride 24 (8-token overlap), identified by their token
    offset. A window is emitted only when it extends coverage beyond
    the previous window's overlap (``start ≤ len - overlap``), so no
    chunk is fully contained in its predecessor; documents shorter than
    one chunk yield exactly one window.

    Scale: a pure narrow stage — split, per-row start grid (explode),
    slice, hash — no shuffle anywhere; chunking 100 TB is scan-bound.
    The md5 chunk hash keeps the output (and the oracle compare)
    compact while pinning the full chunk text byte-for-byte.
    """
    d = load(spark, sf, "documents").withColumn("t", F.split("text", " "))
    starts = F.expr(
        f"sequence(1, greatest(size(t) - {_CHUNK_OVERLAP}, 1),"
        f" {_CHUNK_STRIDE})"
    )
    chunk = F.expr(f"slice(t, start, {_CHUNK_TOKENS})")
    return (
        d.select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            F.size(chunk).cast("bigint").alias("n_tok"),
            # NULL-guarded: concat_ws renders a NULL array as '' (so a
            # NULL-text doc hashed to md5('')) while the oracle's
            # array_to_string null-propagates — round-9 dirty corpus
            F.when(chunk.isNotNull(), F.md5(F.concat_ws(" ", chunk))).alias(
                "chunk_hash"
            ),
        )
    )


_TEMP_ALPHA = 0.5  # multilingual temperature (alpha-sampling) exponent


def temperature_thresholds(docs: DataFrame, key_col: str = "lang") -> DataFrame:
    """``(key, rate, h)`` thresholds for alpha-sampling — THE one copy
    of the recipe, shared by the batch `d7_temperature_sample`, the
    streaming `stream_rate_sample` leg, and their equality tests.

    Determinism: ``sqrt`` is exactly rounded under IEEE-754 on both
    engines (unlike ``pow``), and quantizing pc to integers (×1e6,
    floored) makes the z sum order-independent — every downstream float
    expression then consumes bit-identical inputs on any cluster,
    partitioning, or engine.
    """
    counts = docs.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
    powered = counts.select(
        key_col,
        "c",
        F.floor(F.sqrt(F.col("c").cast("double")) * 1e6)
        .cast("bigint")
        .alias("pc"),
    )
    tot = powered.agg(F.sum("c").alias("n"), F.sum("pc").alias("z"))
    rates = powered.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.least(
            F.lit(1.0),
            (F.col("pc").cast("double") / F.col("z"))
            * (F.col("n").cast("double") / F.col("c")),
        ).alias("rate"),
    )
    return rates.select(
        key_col, "rate", md5_threshold(F.col("rate")).alias("h")
    )


@query(
    "d7_temperature_sample",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    powered AS (
      -- sqrt is exactly rounded (IEEE-754) on both engines, and the
      -- 1e6 integer quantization makes the z sum order-independent:
      -- every downstream float op then sees bit-identical inputs
      SELECT lang, c,
             CAST(FLOOR(sqrt(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS pc
      FROM counts),
    tot AS (SELECT SUM(c) AS n, SUM(pc) AS z FROM powered),
    rates AS (
      -- target share of language s is pc/z of the corpus; dividing by
      -- its own share c/n gives the per-row keep rate, capped at 1
      SELECT lang,
             LEAST(1.0, (CAST(pc AS DOUBLE) / z) * (CAST(n AS DOUBLE) / c))
               AS rate
      FROM powered CROSS JOIN tot),
    thr AS (
      SELECT lang, rate,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(to_hex(LEAST(CAST(FLOOR(rate * 4294967296.0)
                                               AS BIGINT),
                                          4294967295))), 8, '0') END AS h
      FROM rates)
    SELECT d.doc_id, d.lang, ROUND(thr.rate, 6) AS rate
    FROM documents d JOIN thr ON d.lang = thr.lang
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '#T' || d.lang), 1, 8)
          < thr.h
    """,
)
def d7_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: temperature-based LANGUAGE rebalancing — keep rates chosen so
    language s contributes ∝ count_s^{0.5} (the multilingual
    "alpha-sampling" recipe from the mBERT/XLM-R/mT5 reports:
    alpha < 1 upweights small sources without flattening completely,
    between `d7_mixture_sample`'s uniform target (alpha=0) and raw
    proportions (alpha=1)).

    Same physical shape as the uniform variant: one k-row per-source
    aggregate broadcast into a narrow deterministic md5-threshold
    filter — no RNG state, no second pass, identical row set on any
    cluster. The hash salt ('#T') differs from the uniform variant's so
    the two samples are independent.
    """
    from event_streamer_spark.streaming.sampling import stream_rate_sample

    d = load(spark, sf, "documents")
    thr = temperature_thresholds(d)
    # keep_rate=True rides the rate along the existing broadcast join —
    # re-joining thr would build a second broadcast subtree and run the
    # whole thresholds aggregation twice (ReuseExchange can't dedupe
    # two different subtrees)
    return stream_rate_sample(
        d, thr, key_col="lang", salt="#T", keep_rate=True
    ).select("doc_id", "lang", F.round("rate", 6).alias("rate"))


# Neyman (optimal) stratified allocation: sample size per stratum
# proportional to N_h * sigma_h — high-variance strata get more budget
# than proportional allocation would give them.
_NEYMAN_TARGET = 100


@query(
    "d7_neyman_sample",
    oracle=f"""
    WITH stats AS (
      SELECT lang,
             COUNT(*) AS nh,
             SUM(n_chars) AS s1,
             SUM(n_chars * n_chars) AS s2
      FROM documents
      WHERE n_chars BETWEEN 0 AND 1000000000 GROUP BY lang),
    -- N_h * sigma_h = sqrt(N_h * S2 - S1^2) exactly; floor to integer
    -- micro-units so the cross-stratum total is an EXACT BIGINT sum
    -- (a float total's merge order could flip the last ulp and with it
    -- the sampling threshold)
    w AS (
      SELECT lang, nh,
             CAST(FLOOR(SQRT(CAST(nh * s2 - s1 * s1 AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_micro
      FROM stats),
    tot AS (SELECT SUM(w_micro) AS sw FROM w),
    rates AS (
      SELECT lang,
             LEAST(1.0,
                   CAST({_NEYMAN_TARGET} * w_micro AS DOUBLE) / sw / nh)
               AS rate
      FROM w CROSS JOIN tot),
    thr AS (
      SELECT lang, rate,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(to_hex(LEAST(CAST(FLOOR(rate * 4294967296.0)
                                               AS BIGINT),
                                          4294967295))), 8, '0') END AS h
      FROM rates)
    SELECT d.doc_id, d.lang, ROUND(thr.rate, 6) AS rate
    FROM documents d JOIN thr ON d.lang = thr.lang
    WHERE d.n_chars BETWEEN 0 AND 1000000000
      AND substr(md5(CAST(d.doc_id AS VARCHAR) || '@' || d.lang), 1, 8)
          < thr.h
    """,
)
def d7_neyman_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: Neyman-allocation stratified sampling — per-stratum rates
    proportional to ``N_h·σ_h``, the variance-optimal budget split for
    estimating a corpus mean from a fixed sample size.

    Determinism protocol: the per-stratum variance comes from EXACT
    integer moments — ``N·S2 − S1²`` computed in DECIMAL(38,0) on the
    Spark side and HUGEINT on DuckDB's (review r8: at the family's
    stated 10⁹-docs-per-stratum regime ``S1²`` ≈ 10²⁶ silently wraps a
    64-bit long; both exact types hold it, same treatment as
    ``d16_order_reconcile``'s corpus sums) — then one deterministic
    ``SQRT`` per stratum, no float accumulation. The weight is floored
    to integer micro-units so the cross-stratum normalizer is an exact
    BIGINT sum (a float total's merge order could flip the last ulp
    and with it a threshold hex digit), and row selection is the
    shared salted-md5 threshold. One map-combinable stats pass, a
    #strata-row broadcast, one filter scan — the d7 family shape.
    """
    # metric domain: 0 <= n_chars <= 10^9 on BOTH engines (round-10
    # hostile corpus: a 2^60 "char count" squared overflows even
    # DECIMAL(38,0) once multiplied by the stratum size; a 1 GiB-of-
    # text upper bound keeps nh*s2 <= 1e38 through the documented
    # 10^9-docs-per-stratum regime, and physically impossible values
    # are corruption, not data)
    d = load(spark, sf, "documents").filter(
        F.col("n_chars").between(0, 1_000_000_000)
    )
    dec = "decimal(38,0)"
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.col("n_chars").cast(dec)).alias("s1"),
        F.sum(
            F.col("n_chars").cast(dec) * F.col("n_chars").cast(dec)
        ).alias("s2"),
    )
    w = stats.select(
        "lang",
        "nh",
        F.floor(
            F.sqrt(
                (
                    F.col("nh").cast(dec) * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
            )
            * 1_000_000
        )
        .cast("long")
        .alias("w_micro"),
    )
    tot = w.agg(F.sum("w_micro").alias("sw"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.lit(_NEYMAN_TARGET) * F.col("w_micro")).cast("double")
            / F.col("sw")
            / F.col("nh"),
        ).alias("rate"),
    )
    thr = rates.select("lang", "rate", md5_threshold(F.col("rate")).alias("h"))
    key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit("@"), F.col("lang"))
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(F.substring(key, 1, 8) < F.col("h"))
        .select("doc_id", "lang", F.round("rate", 6).alias("rate"))
    )


# Systematic (deterministic) weighted sampling target.
_SYSTEMATIC_N = 100


@query(
    "d7_systematic_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars AS wt FROM documents
      WHERE n_chars BETWEEN 1 AND 1000000000),
    c AS (
      SELECT doc_id, wt,
             SUM(wt) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - wt AS cum0,
             SUM(wt) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum1
      FROM w),
    tot AS (SELECT SUM(wt) AS tw FROM w)
    SELECT doc_id, CAST(wt AS BIGINT) AS weight,
           CAST(((2 * {_SYSTEMATIC_N} * cum1 + tw - 1) // (2 * tw))
                - ((2 * {_SYSTEMATIC_N} * cum0 + tw - 1) // (2 * tw))
             AS BIGINT) AS multiplicity
    FROM c CROSS JOIN tot
    WHERE ((2 * {_SYSTEMATIC_N} * cum1 + tw - 1) // (2 * tw))
          - ((2 * {_SYSTEMATIC_N} * cum0 + tw - 1) // (2 * tw)) > 0
    """,
)
def d7_systematic_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: systematic weighted sampling WITH replacement — n=100 draws
    at deterministic equal strides through the cumulative weight line
    (offsets at ``(2k+1)·W/2n``), so every run, partition count, and
    engine produces the IDENTICAL sample and each doc's multiplicity
    is provably ``floor`` or ``ceil`` of its proportional share
    ``n·w/W`` (the low-variance property random multinomial sampling
    lacks). All arithmetic is exact integers: a doc's draw count is
    the number of odd multiples of W inside its scaled interval
    ``[2n·cum₀, 2n·cum₁)``, counted by the closed form
    ``g(x) = (x + W − 1) div 2W`` — every argument non-negative, so
    trunc and floor division agree on both engines.

    Scale: the cumulative line comes from the same three-level
    ``exclusive_prefix_sum`` scan as D9 sequence packing (no
    unpartitioned window in the Spark plan — the oracle's plain
    window is DuckDB-side only); the total is a 1-row broadcast; the
    multiplicity is then a per-row expression. ``2n·W`` must fit
    BIGINT — at 100 TB of text (~10¹⁴ chars) that is ~2×10¹⁶, three
    orders inside the 9.2×10¹⁸ ceiling.
    """
    # weight domain 1..10^9 on BOTH engines (round-10 hostile corpus:
    # one 2^60 weight pushes 2n*W past BIGINT; the docstring's
    # "2n*W must fit BIGINT" precondition becomes an enforced domain)
    w = (
        load(spark, sf, "documents")
        .filter(F.col("n_chars").between(1, 1_000_000_000))
        .select("doc_id", F.col("n_chars").alias("wt"))
    )
    c = exclusive_prefix_sum(w, "doc_id", "wt", out_col="cum0")
    c = c.withColumn("cum1", F.col("cum0") + F.col("wt"))
    tot = w.agg(F.sum("wt").alias("tw"))
    n2 = 2 * _SYSTEMATIC_N
    mult = F.expr(
        f"(({n2} * cum1 + tw - 1) DIV (2 * tw))"
        f" - (({n2} * cum0 + tw - 1) DIV (2 * tw))"
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .withColumn("multiplicity", mult)
        .filter(F.col("multiplicity") > 0)
        .select(
            "doc_id",
            F.col("wt").cast("long").alias("weight"),
            F.col("multiplicity").cast("long"),
        )
    )
