"""Corpus-quality operators a pretraining pipeline needs (SURVEY §2.C D4
extensions): repetition filters, TF-IDF, span-level exact dedup.

The reference has no text pipeline at all (it is a Kafka microservice
wrapper); these follow the published web-corpus curation recipes —
repetition fractions as in the Gopher/MassiveText quality filters
(Rae et al. 2021, §A1.1) and span dedup in the spirit of C4's
three-sentence dedup (Raffel et al. 2020, §2.2) adapted to the
fixture's single-line word-stream documents.

Scale posture: everything is explode → keyed aggregation — shuffles
partition on (doc_id) or (doc_id, gram), both high-cardinality and
skew-free; no driver state, no O(n²) stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load


@query(
    "d4_repetition_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    uni AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM t, UNNEST(toks) AS u(w) GROUP BY doc_id, w),
    us AS (
      SELECT doc_id, MAX(c) AS topc, SUM(c) AS n,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
      FROM uni GROUP BY doc_id),
    bg AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
      FROM t, UNNEST(range(1, len(toks))) AS u(i)),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    bs AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n FROM bgc GROUP BY doc_id)
    SELECT us.doc_id,
           ROUND(CAST(us.topc AS DOUBLE) / us.n, 6) AS top_unigram_frac,
           ROUND(CAST(us.dup AS DOUBLE) / us.n, 6) AS dup_word_frac,
           ROUND(CAST(bs.topc AS DOUBLE) / bs.n, 6) AS top_bigram_frac
    FROM us JOIN bs ON us.doc_id = bs.doc_id
    """,
)
def d4_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """D4: Gopher-style repetition fractions per document — the share of
    tokens taken by the most frequent unigram, by all repeated unigrams,
    and of bigram slots taken by the most frequent bigram. High values
    flag boilerplate/spam for corpus filtering.

    Two keyed aggregations per granularity (count per gram, then max/sum
    per doc) — all shuffles are on (doc_id[, gram]), skew-free; integer
    counts make the rounded ratios bit-stable on both engines.
    """
    t = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    uni = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    us = uni.groupBy("doc_id").agg(
        F.max("c").alias("topc"),
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup"),
    )
    # guard: sequence(1, 0) on a 1-token doc would yield the DESCENDING
    # [1, 0] and fabricate phantom bigrams via concat_ws null-skipping;
    # docs without bigrams must drop from the inner join like the oracle
    bg = t.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat_ws(' ', toks[i-1], toks[i]))"
            )
        ).alias("g"),
    )
    bs = (
        bg.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"), F.sum("c").alias("n"))
    )
    return (
        us.alias("us")
        .join(bs.alias("bs"), "doc_id")
        .select(
            "doc_id",
            F.round(F.col("us.topc").cast("double") / F.col("us.n"), 6).alias(
                "top_unigram_frac"
            ),
            F.round(F.col("us.dup").cast("double") / F.col("us.n"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("bs.topc").cast("double") / F.col("bs.n"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


@query(
    "d4_tfidf_topk",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, w, COUNT(*) AS tf
      FROM t, UNNEST(toks) AS u(w) GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    scored AS (
      SELECT tf.doc_id, tf.w,
             ROUND(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / df.df), 6) AS score
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n_docs),
    ranked AS (
      SELECT doc_id, w, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w) AS rn
      FROM scored)
    SELECT doc_id, w AS term, score FROM ranked WHERE rn <= 3
    """,
)
def d4_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D4: top-3 TF-IDF terms per document (tf × ln(N/df)).

    The document-frequency table is tiny (vocabulary-sized) relative to
    the corpus, so Catalyst/AQE broadcasts it into the term-count join;
    the only big shuffles are the two keyed counts. N comes from a
    1-row aggregate (crossJoin of a literal-sized side). Ties broken by
    (score desc, term) for a stable row set.
    """
    t = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))
    tf = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )


_SPAN_TOKENS = 5


@query(
    "d1_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    spans AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, {_SPAN_TOKENS}*j + 1,
                                        {_SPAN_TOKENS}*j + {_SPAN_TOKENS}), ' ')
               AS span
      FROM t, UNNEST(range(0, len(toks) // {_SPAN_TOKENS})) AS u(j)
      WHERE len(toks) >= {_SPAN_TOKENS})
    SELECT sha256(span) AS span_hash,
           COUNT(*) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
    FROM spans
    GROUP BY sha256(span)
    HAVING COUNT(*) > 1
    """,
)
def d1_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D1/C4-style span dedup: non-overlapping {5}-token spans hashed
    corpus-wide; spans occurring in more than one place are reported
    with their canonical keeper (min doc_id) — the drop-list a C4-style
    "remove repeated three-sentence spans" pass consumes.

    One explode (bounded: tokens/span per doc) + one groupBy on the
    span hash — uniform 256-bit keys, skew-free, no driver state.
    """
    t = (
        load(spark, sf, "documents")
        .withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= _SPAN_TOKENS)
    )
    spans = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, int(size(toks) / {_SPAN_TOKENS}) - 1),"
                f" j -> concat_ws(' ', slice(toks, {_SPAN_TOKENS}*j + 1,"
                f" {_SPAN_TOKENS})))"
            )
        ).alias("span"),
    )
    return (
        spans.groupBy(F.sha2("span", 256).alias("span_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


@query(
    "d4_bm25_search",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (
      SELECT doc_id, len(toks) AS dl,
             len(list_filter(toks, x -> x = 'spark'))  AS tf1,
             len(list_filter(toks, x -> x = 'merge'))  AS tf2,
             len(list_filter(toks, x -> x = 'window')) AS tf3
      FROM t),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
      FROM d)
    SELECT doc_id,
           ROUND(
             (ln(((n - df1 + 0.5) / (df1 + 0.5)) + 1) * (tf1 * 2.2))
               / (tf1 + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
           + (ln(((n - df2 + 0.5) / (df2 + 0.5)) + 1) * (tf2 * 2.2))
               / (tf2 + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
           + (ln(((n - df3 + 0.5) / (df3 + 0.5)) + 1) * (tf3 * 2.2))
               / (tf3 + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 6) AS bm25
    FROM d CROSS JOIN stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def d4_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """D4: BM25 keyword retrieval (Robertson/Sparck Jones; k1=1.2, b=0.75)
    for a fixed 3-term query over the corpus, top-20 by score.

    Scale: per-doc term frequencies are pure array expressions (no
    explode — the per-term `filter(toks, ...)` runs inside codegen);
    corpus statistics (N, avgdl, per-term df) are ONE 1-row partial
    aggregate broadcast back, so the whole query is scan → 1-row agg →
    broadcast join → TakeOrderedAndProject. No vocabulary-sized shuffle
    at all — this is the cheap keyword-search path next to d4_tfidf_topk.

    Determinism: tf/df/dl/N are exact integers; the float expression is
    written with identical association on both engines, and ln() on the
    same libm — bit-stable, so ROUND(...,6) matches the oracle.

    r13 (guide §5.3): the per-doc tf frame feeds BOTH the corpus-stats
    aggregate and the scoring projection — unpersisted, Catalyst inlines
    the tokenize subtree (split + 3 array filters over every document)
    at each reference, so the corpus was tokenized twice per run. The
    frame is 5 narrow numerics per doc (no text column), so one
    ``bounded_persist`` halves the heavy pass; at scale the cached frame
    is doc-count-sized, not corpus-byte-sized.
    """
    from event_streamer_spark.caching import bounded_persist

    terms = ["spark", "merge", "window"]
    t = load(spark, sf, "documents").withColumn("toks", F.split("text", " "))

    def tf(trm: str) -> F.Column:
        # single-param lambda: a 2-param one is read as (element, index)
        return F.size(F.filter("toks", lambda x: x == F.lit(trm)))

    d = bounded_persist(
        t.select(
            "doc_id",
            F.size("toks").alias("dl"),
            *[tf(trm).alias(f"tf{i+1}") for i, trm in enumerate(terms)],
        ),
        "text2.bm25_docstats",
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i+1}") > 0).cast("int")).alias(f"df{i+1}")
            for i in range(len(terms))
        ],
    )

    def contrib(i: int) -> F.Column:
        tf = F.col(f"tf{i}")
        df = F.col(f"df{i}")
        idf = F.log(((F.col("n") - df + 0.5) / (df + 0.5)) + 1)
        denom = tf + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl")))
        return (idf * (tf * 2.2)) / denom

    return (
        d.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(contrib(1) + contrib(2) + contrib(3), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "d4_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(AVG(LN(CAST(c AS DOUBLE) / n)), 6) AS avg_logprob
    FROM toks JOIN cnt USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def d4_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """D4: corpus-trained unigram log-probability quality score — the
    KenLM-style perplexity filter's shape with the corpus itself as the
    language model: score(doc) = mean over tokens of ln(count(tok)/N).
    Low scores flag documents full of corpus-rare tokens (gibberish,
    boilerplate explosions); the standard pretraining-data quality
    signal when a real LM isn't shipped.

    Scale: the unigram table is vocab-sized — small for curated text
    but heavy-tailed on raw web corpora (typos/ids explode the
    vocabulary), so the join strategy is deliberately LEFT TO AQE:
    it broadcasts when the vocab is small and falls back to a shuffle
    join on ``tok`` when it isn't (forcing a broadcast here would OOM
    on a billion-token tail). The total-token count reduces from the
    vocab table and broadcasts as 1 row; scoring is one join + per-doc
    aggregate. ln() runs on the same libm both engines use and the
    mean is rounded to the repo's 6-decimal grain.
    """
    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # total tokens from the ALREADY-REDUCED vocab table, not a second
    # corpus pass: N = Σ count(tok)
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        toks.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_logprob"),
        )
    )


@query("d4_compression_ratio", oracle=None)  # codec output → rows-only
def d4_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """D4: per-document compression-ratio quality signal — the
    published "too-compressible means boilerplate/repetition" filter
    (used alongside the Gopher repetition rules in web-corpus
    curation): ratio = deflate(text) / len(text), flag docs below a
    threshold.

    Scale: a narrow Arrow-batched mapInPandas pass (zlib level 6 —
    CPU-light, scan-bound); no shuffle at all. Rows-only by design:
    DEFLATE output length is codec-version-dependent, so there is no
    engine-independent oracle — behavior is pinned by invariant tests
    (repetitive ≪ novel text, determinism) in tests/test_text.py.
    """
    import pandas as pd

    docs = load(spark, sf, "documents").select("doc_id", "text")

    def ratio(batches):
        import zlib

        for pdf in batches:
            if pdf.empty:
                continue
            # NULL text → NULL ratio (round-9 dirty corpus: .encode
            # yields NaN for None and zlib crashed the batch)
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(
                lambda b: len(zlib.compress(b, 6)) if isinstance(b, bytes)
                else None
            )
            n = raw.map(
                lambda b: max(len(b), 1) if isinstance(b, bytes) else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("Int64"),
                    "compression_ratio": (comp / n).round(6),
                }
            )

    out = docs.mapInPandas(
        ratio, "doc_id long, n_bytes bigint, compression_ratio double"
    )
    return out.withColumn(
        "too_compressible", F.col("compression_ratio") < 0.3
    )


# Jelinek-Mercer interpolation weight for the bigram LM score.
_JM_LAMBDA = 0.7


def _row_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-token pairs ``(doc_id, prev, tok)`` derived WITHIN each
    physical row — ``zip_with`` over the split array, no window.

    Round-10 conflicting-duplicates fix: the previous derivation
    (posexplode → LAG over a (doc_id, pos) window) is ILL-DEFINED when
    a doc_id carries two different texts — both copies' tokens share
    positions, the window's tie order is engine-arbitrary, and the two
    engines interleaved the copies differently (seed-20260817 hostile
    corpus: doc 206 scored 65 bigrams on Spark, 62 on DuckDB). Within-
    row construction is deterministic for ANY duplicate structure —
    copies contribute their own bigrams and counts simply add — and it
    deletes the sequence shuffle from the plan entirely (the window
    exchanged the whole exploded token table; this is a narrow map).
    The oracles mirror it with ``toks[i], toks[i+1]`` over
    ``range(1, len(toks))``.
    """
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS prev, b AS tok))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.prev", "p.tok")
    )


@query(
    "d4_bigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    tk AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
    seqd AS (
      SELECT doc_id, toks[i] AS prev, toks[i+1] AS tok
      FROM t, UNNEST(range(1, len(toks))) AS u(i)),
    uni AS (SELECT tok, COUNT(*) AS cu FROM tk GROUP BY tok),
    ctx AS (SELECT prev, COUNT(*) AS cc FROM seqd GROUP BY prev),
    bi AS (SELECT prev, tok, COUNT(*) AS cb FROM seqd GROUP BY prev, tok),
    tot AS (SELECT SUM(cu) AS n FROM uni)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN({_JM_LAMBDA} * (CAST(b.cb AS DOUBLE) / c.cc)
                        + {1 - _JM_LAMBDA}
                          * (CAST(u.cu AS DOUBLE) / t.n))), 6)
             AS avg_logprob
    FROM seqd s
    JOIN bi b ON b.prev = s.prev AND b.tok = s.tok
    JOIN ctx c ON c.prev = s.prev
    JOIN uni u ON u.tok = s.tok
    CROSS JOIN tot t
    GROUP BY s.doc_id
    """,
)
def d4_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """D4: interpolated bigram language-model score — the step up from
    ``d4_unigram_logprob`` toward the KenLM-style filter:
    ``score(doc) = mean over bigrams of
    ln(λ·c(prev,tok)/c(prev) + (1−λ)·c(tok)/N)``, Jelinek-Mercer
    smoothed so unseen-context mass falls back to the unigram (every
    bigram scored here IS seen — the corpus is the model — but the
    interpolation is what makes the score a smooth quality signal
    rather than a seen/unseen cliff).

    Scale: the bigram and context tables are data-bounded (≤ corpus
    bigrams, heavy-tailed on raw web text), so all three probability
    joins are LEFT TO AQE like the unigram's (broadcast when small,
    shuffle on the token key when not); the sequence derivation is a
    NARROW within-row ``zip_with`` (round 10 — see :func:`_row_bigrams`
    for why the previous (doc_id, pos) LAG window was both a whole-
    table shuffle and non-deterministic under conflicting duplicate
    doc_ids), ``bounded_persist``-ed because four consumers read it;
    per-doc scoring is a single aggregate. ln() runs on the same libm
    both engines use and the mean rounds to the repo's 6-decimal grain.
    """
    from event_streamer_spark.caching import bounded_persist

    # within-row bigram derivation (see _row_bigrams: the round-10
    # conflicting-duplicates fix; also deletes the sequence window's
    # full-table shuffle). Persisted: four consumers (ctx, bi, and the
    # scoring probe's pair scan + join keys).
    pairs = bounded_persist(_row_bigrams(spark, sf), "text2.bigram_seq")
    toks = load(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    ctx = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("cc"))
    bi = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cb"))
    tot = uni.agg(F.sum("cu").alias("n"))
    p = F.lit(_JM_LAMBDA) * (
        F.col("cb").cast("double") / F.col("cc")
    ) + F.lit(1 - _JM_LAMBDA) * (F.col("cu").cast("double") / F.col("n"))
    return (
        pairs.join(bi, ["prev", "tok"])
        .join(ctx, "prev")
        .join(uni, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )


@query(
    "d4_readability",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS syllables,
             CAST(len(regexp_extract_all(text, '[^ ]+'))
               AS BIGINT) AS words,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS sents
      FROM documents)
    SELECT doc_id, words, sents, syllables,
           CAST((39 * words) // sents + (1180 * syllables) // words - 1559
             AS BIGINT) AS fk_grade_centi
    FROM c
    WHERE words > 0
    """,
)
def d4_readability(spark: SparkSession, sf: str) -> DataFrame:
    """D4: Flesch–Kincaid grade-level readability, exact fixed-point —
    the quality-scoring sibling every training-data pipeline keeps
    next to stopword/length heuristics. Syllables via the standard
    vowel-GROUP heuristic (``[aeiouy]+`` runs never span whitespace,
    so counting over the whole text equals the per-word sum without a
    tokenize stage); sentences via terminal-punctuation runs with a
    floor of 1. The grade formula ``0.39·W/S + 11.8·Y/W − 15.59`` is
    computed ×100 in integer arithmetic — ``(39·W) DIV S +
    (1180·Y) DIV W − 1559`` — with per-term truncation as the DEFINED
    metric (DIV and ``//`` truncate identically, probed), so the
    result hash-matches the oracle instead of chasing float rounding.

    Scale: one narrow projection over the corpus — three regexp
    counts and integer math per row, no shuffle at all (the one
    operator class that is always embarrassingly parallel).
    """
    d = load(spark, sf, "documents")
    c = d.selectExpr(
        "doc_id",
        "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
        " AS BIGINT) AS syllables",
        "CAST(size(regexp_extract_all(text, '[^ ]+', 0))"
        " AS BIGINT) AS words",
        "CAST(GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
        " AS BIGINT) AS sents",
    )
    return c.filter(F.col("words") > 0).selectExpr(
        "doc_id",
        "words",
        "sents",
        "syllables",
        "CAST((39 * words) DIV sents + (1180 * syllables) DIV words - 1559"
        " AS BIGINT) AS fk_grade_centi",
    )


# Minimum bigram count for a collocation candidate: PMI is notoriously
# noisy at low counts (a hapax pair maximizes the ratio), so the
# standard practice (Church & Hanks 1990) is a count floor. 3 keeps
# the oracle non-vacuous at sf0.001 (904 qualifying bigram types).
_PMI_MIN_COUNT = 3


@query(
    "d4_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    tk AS (SELECT doc_id, UNNEST(toks) AS tok FROM t),
    seqd AS (
      SELECT doc_id, toks[i] AS prev, toks[i+1] AS tok
      FROM t, UNNEST(range(1, len(toks))) AS u(i)),
    uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM tk
            GROUP BY tok),
    bi AS (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS c_xy FROM seqd
           GROUP BY prev, tok),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tk)
    SELECT b.prev, b.tok, b.c_xy,
           (1000000 * b.c_xy * t.n) // (ux.cu * uy.cu) AS pmi_ratio_ppm
    FROM bi b
    JOIN uni ux ON ux.tok = b.prev
    JOIN uni uy ON uy.tok = b.tok
    CROSS JOIN tot t
    WHERE b.c_xy >= {_PMI_MIN_COUNT}
    """,
)
def d4_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """D4: pointwise-mutual-information collocations (Church & Hanks,
    1990) — adjacent token pairs whose corpus-wide co-occurrence beats
    the independence expectation: PMI = log(P(x,y)/(P(x)P(y))). log is
    monotone, so the RANKING statistic is the raw ratio
    c(x,y)·N / (c(x)·c(y)), kept as an exact integer ppm with the
    DIV/``//`` truncation parity — no float in the oracle at all
    (unlike ``d4_bigram_logprob``, which needs ln for its additive
    score). A count floor of {_PMI_MIN_COUNT} applies (hapax pairs
    maximize PMI vacuously — the classic failure mode).

    Scale: the bigram derivation is a narrow within-row ``zip_with``
    (round 10, :func:`_row_bigrams`); the token explode is
    ``bounded_persist``-ed because two consumers read it (unigram
    counts, token total); both count tables are map-side-combinable
    aggregates on token keys; the probability joins broadcast when the
    vocabulary is small and shuffle on the token key when it is not
    (left to AQE, heavy-tailed on real text). ppm bound:
    10^6·c(x,y)·N needs c(x,y)·N < 9.2·10^12 — beyond ~10^6-token
    corpora with million-count bigrams, widen to DECIMAL(38,0) as in
    ``d15_trend_ols``.
    """
    from event_streamer_spark.caching import bounded_persist

    # within-row bigram derivation (see _row_bigrams — round-10
    # conflicting-duplicates fix + sequence-shuffle deletion)
    toks = bounded_persist(
        load(spark, sf, "documents").select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ),
        "d4_pmi_toks",
    )
    uni = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("cu"))
    bi = (
        _row_bigrams(spark, sf)
        .groupBy("prev", "tok")
        .agg(F.count("*").cast("bigint").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    tot = toks.agg(F.count("*").cast("bigint").alias("n"))
    ux = uni.select(F.col("tok").alias("prev"), F.col("cu").alias("cu_x"))
    uy = uni.select("tok", F.col("cu").alias("cu_y"))
    return (
        bi.join(ux, "prev")
        .join(uy, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "tok",
            "c_xy",
            F.expr("(1000000 * c_xy * n) DIV (cu_x * cu_y)").alias(
                "pmi_ratio_ppm"
            ),
        )
    )
