"""Training-corpus curation extensions, round 10 session 2: DSIR-style
importance resampling, Zipf-slope corpus statistics, cross-snapshot
incremental dedup, a GROUPS window-frame emulation, and distributed
PCA over the embedding table.

Reference parity note: the reference (comparaonline/event-streamer,
``src/`` — a KafkaJS routing wrapper, see `src/consumer/index.ts:1`)
has no relational or corpus surface; these extend the §2.B/§2.D
mandate the way `relational3.py` / `pipeline.py` do.

Engine-difference ledger for this module:

- ``LN`` runs on java.lang.Math.log (Spark) vs C libm (DuckDB) — equal
  to the last ulp on every probed input, so scores are rounded to the
  repo's 6-decimal grain BEFORE they feed any cross-row comparison
  (rank orders use the rounded value + a unique-id tiebreak, never raw
  doubles).
- ``%`` truncates toward zero on BOTH engines (dividend sign), so the
  portable non-negative residue is spelled ``((x % m) + m) % m`` on
  both sides (hostile corpora inject negative doc_ids).
- DuckDB has no GROUPS window frame (ParserException as of 1.x), so
  ``b75_groups_frame``'s oracle expresses GROUPS semantics portably:
  ``dense_rank`` over the order key, then a ``RANGE BETWEEN 1
  PRECEDING AND 1 FOLLOWING`` frame on that rank — the exact published
  rewrite, run by BOTH engines (cross-engine verified rather than
  vs-native). The dense_rank order pins ``NULLS LAST`` explicitly:
  Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST, and a
  NULL-date peer group lands at opposite ends otherwise (caught by the
  seed-20260820 hostile replay on first run).
- Conflicting duplicate doc_ids (the seed-20260817 CDC corruption
  class) make any per-doc score ill-defined, so every query here
  canonicalizes documents to ONE row per doc_id first (min (text,
  lang, source) copy, NULLS LAST — a total order, pinned as
  ``_UNIQ_FULL_CTE`` / :func:`unique_full_docs`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# One canonical (doc_id, text, lang, source) row per doc_id. The
# d1-span precedent (`dedup._UNIQ_DOCS_CTE`) keeps only (doc_id, text);
# the corpus queries below also score by lang/source, so the tiebreak
# covers all three payload columns for a total order under conflicting
# duplicates.
_UNIQ_FULL_CTE = """uniq AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY text NULLS LAST,
                                           lang NULLS LAST,
                                           source NULLS LAST) AS __rn
        FROM documents) WHERE __rn = 1)"""


def canonicalize_docs(docs: DataFrame) -> DataFrame:
    """One row per doc_id by the :data:`_UNIQ_FULL_CTE` rule (min
    (text, lang, source), NULLS LAST) — shared by the batch reader and
    the streaming ingest legs so "duplicate doc_id" resolves the same
    way everywhere a raw document frame enters the engine."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("text").asc_nulls_last(),
        F.col("lang").asc_nulls_last(),
        F.col("source").asc_nulls_last(),
    )
    return (
        docs.select("doc_id", "text", "lang", "source")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def unique_full_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Spark twin of :data:`_UNIQ_FULL_CTE`."""
    return canonicalize_docs(load(spark, sf, "documents"))


# -- D7: DSIR importance resampling ------------------------------------

# Laplace-smoothed unigram log-likelihood ratio, written ONCE and
# compiled by both engines so the double arithmetic is op-for-op
# identical: ratio = P_target(tok) / P_corpus(tok) with +1 smoothing
# over a shared vocabulary V.
_DSIR_CONTRIB = (
    "LN(((CAST(c_t AS DOUBLE) + 1) / (CAST(n_t AS DOUBLE) + CAST(v AS DOUBLE)))"
    " / ((CAST(c_a AS DOUBLE) + 1) / (CAST(n_a AS DOUBLE) + CAST(v AS DOUBLE))))"
)


def dsir_doc_token_counts(docs: DataFrame) -> DataFrame:
    """Per-document token counts — the shared DSIR primitive: one row
    per (doc_id, source, is_target, tok) with multiplicity ``k``.
    Expects ALREADY-CANONICAL documents (unique doc_id — the batch
    query feeds :func:`unique_full_docs`; the streaming leg declares
    it as the ingest precondition). Grouping to (doc, token) BEFORE
    scoring shrinks the scoring join from token instances to distinct
    doc-token pairs — a 2-3× row reduction on natural text, more on
    repetitive web text."""
    return (
        docs.select(
            "doc_id",
            "source",
            F.coalesce(F.col("lang") == "en", F.lit(False)).alias(
                "is_target"
            ),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .groupBy("doc_id", "source", "is_target", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )


def dsir_score_from_counts(toks: DataFrame) -> DataFrame:
    """Score + rank from (doc_id, source, is_target, tok, k) counts —
    the shared DSIR tail used by both the batch query and the
    streaming index's read side (the drift.py convention: one scoring
    definition, two ingestion paths). See ``d7_dsir_resample`` for the
    determinism and scale contract.

    r13: ``toks`` feeds BOTH the vocabulary aggregate and the scoring
    join — unpersisted, Catalyst inlined the whole explode + (doc,
    token) groupBy subtree once per reference (plan-audited: 3 parquet
    scans of documents, two token-explode shuffles per run). One
    bounded_persist materialization serves both consumers."""
    from event_streamer_spark.caching import bounded_persist

    toks = bounded_persist(toks, "dsir.toks")
    cnt = toks.groupBy("tok").agg(
        F.sum("k").cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("is_target"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    scored = (
        toks.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("k").cast("bigint").alias("n_toks"),
            F.round(
                F.sum(F.expr(f"CAST(k AS DOUBLE) * {_DSIR_CONTRIB}")), 6
            ).alias("dsir_score"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("dsir_score").desc(), F.col("doc_id").asc()
    )
    return scored.select(
        "doc_id", "source", "n_toks", "dsir_score",
        F.row_number().over(w).cast("bigint").alias("src_rank"),
    )


@query(
    "d7_dsir_resample",
    oracle=f"""
    WITH {_UNIQ_FULL_CTE},
    toks AS (
      SELECT doc_id, source,
             COALESCE(lang = 'en', FALSE) AS is_target,
             tok, CAST(COUNT(*) AS BIGINT) AS k
      FROM (SELECT doc_id, lang, source,
                   unnest(string_split(text, ' ')) AS tok
            FROM uniq)
      GROUP BY doc_id, source, is_target, tok),
    cnt AS (
      SELECT tok,
             CAST(SUM(k) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN is_target THEN k ELSE 0 END) AS BIGINT)
               AS c_t
      FROM toks GROUP BY tok),
    tot AS (
      SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_t) AS BIGINT) AS n_t,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM cnt),
    scored AS (
      SELECT doc_id, source,
             CAST(SUM(k) AS BIGINT) AS n_toks,
             ROUND(SUM(CAST(k AS DOUBLE) * {_DSIR_CONTRIB}), 6)
               AS dsir_score
      FROM toks JOIN cnt USING (tok) CROSS JOIN tot
      GROUP BY doc_id, source)
    SELECT doc_id, source, n_toks, dsir_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY dsir_score DESC, doc_id)
                AS BIGINT) AS src_rank
    FROM scored
    """,
)
def d7_dsir_resample(spark: SparkSession, sf: str) -> DataFrame:
    """D7: DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the Laplace-smoothed unigram log-likelihood
    ratio between a TARGET distribution (here: the ``lang='en'``
    slice, standing in for "looks like the eval domain") and the full
    corpus, then rank within source for per-source quota selection
    (``src_rank <= k`` is the caller's keep predicate).

    Engine determinism: the per-token ratio is one shared expression
    (:data:`_DSIR_CONTRIB`) compiled by both engines on exact BIGINT
    counts, the per-doc sum is rounded to the 6-decimal grain, and the
    rank orders by (rounded score, doc_id) — a total order after the
    module-level doc_id canonicalization, so conflicting-duplicate and
    negative-id hostile rows cannot produce engine-arbitrary ranks.

    Scale: two token-keyed aggregates (vocab-sized output), one
    3-scalar reduction that broadcasts, one scoring join LEFT TO AQE
    (broadcast when the vocab is small, shuffle on ``tok`` when a raw
    web tail explodes it — same policy as ``d4_unigram_logprob``), one
    per-doc aggregate, and a per-source rank window whose partitions
    are source-bounded. No driver state, no all-pairs anything; at
    100 TB the cost is two scans + two shuffles, the published DSIR
    hashed-ngram variant being a drop-in replacement for ``tok`` if
    the vocabulary needs capping. Scoring runs on (doc, token, k)
    GROUPED counts (``dsir_doc_token_counts``), so the per-token
    contribution is weighted ``k·LN(ratio)`` on both engines — the
    scoring join carries distinct doc-token pairs, not token
    instances, and the same counts table is what the streaming index
    (`streaming/dsir.py`) persists per micro-batch.
    """
    return dsir_score_from_counts(
        dsir_doc_token_counts(unique_full_docs(spark, sf))
    )


# -- D4: Zipf slope per source ------------------------------------------

_ZIPF_TOP_RANKS = 100


@query(
    "d4_zipf_slope",
    oracle=f"""
    WITH {_UNIQ_FULL_CTE},
    toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM uniq),
    cnt AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, tok) AS rnk
      FROM cnt),
    pts AS (
      SELECT source,
             CAST(ROUND(LN(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS x_u,
             CAST(ROUND(LN(CAST(c   AS DOUBLE)) * 1000000) AS BIGINT) AS y_u
      FROM ranked WHERE rnk <= {_ZIPF_TOP_RANKS}),
    sums AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT)     AS n,
             CAST(SUM(x_u) AS BIGINT)     AS sx,
             CAST(SUM(y_u) AS BIGINT)     AS sy,
             CAST(SUM(x_u * y_u) AS BIGINT) AS sxy,
             CAST(SUM(x_u * x_u) AS BIGINT) AS sxx
      FROM pts GROUP BY source)
    SELECT source, n AS n_ranks,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 6)
           END AS zipf_slope
    FROM sums
    """,
)
def d4_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """D4: per-source Zipf slope — OLS fit of ln(frequency) on
    ln(rank) over each source's top-{_ZIPF_TOP_RANKS} token ranks.
    Natural text sits near slope −1; a source drifting toward 0 (flat)
    flags id/boilerplate floods, and strongly steeper-than-−1 flags
    template repetition — a standard corpus-mix health check.

    Engine determinism: ranks and counts are exact BIGINTs with a
    (count DESC, token) total order; each regression point is rounded
    to micro units ONCE (``CAST(ROUND(LN(..)*1e6) AS BIGINT)``) so all
    four OLS sums are exact integer arithmetic — associative, immune
    to partial-aggregation order — and only the final slope division
    happens in DOUBLE (then rounded to the 6-decimal grain). Degenerate
    sources (<2 distinct ranks) yield NULL via an exact integer
    zero-denominator test. Bounds: |x_u|,|y_u| ≤ 21·1e6 ⇒ Σx·y over
    ≤{_ZIPF_TOP_RANKS} points ≤ 4.5e16, and n·Σxy ≤ 4.5e18 < 2^63.

    Scale: one (source, tok) aggregate, a per-source top-R rank window
    (R={_ZIPF_TOP_RANKS} — output bounded per source regardless of
    vocabulary size), and a per-source 5-sum reduce. The rank window
    partitions by source; a skewed mega-source is still one partition
    of VOCAB rows, not corpus rows, and the b15-style two-level
    distrank rewrite applies if a single source's vocabulary outgrows
    an executor.
    """
    toks = unique_full_docs(spark, sf).select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("tok").asc()
    )
    pts = (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ZIPF_TOP_RANKS)
        .select(
            "source",
            F.expr(
                "CAST(ROUND(LN(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT)"
            ).alias("x_u"),
            F.expr(
                "CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"
            ).alias("y_u"),
        )
    )
    sums = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("y_u").cast("bigint").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).cast("bigint").alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "source",
        F.col("n").alias("n_ranks"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6))
        .alias("zipf_slope"),
    )


# -- D2: cross-snapshot incremental dedup -------------------------------

_INCR_MOD = 10
_INCR_SLICE = 7


@query(
    "d2_incremental_dedup",
    oracle=f"""
    WITH {_UNIQ_FULL_CTE},
    tagged AS (
      SELECT doc_id, sha256(text) AS h,
             ((doc_id % {_INCR_MOD}) + {_INCR_MOD}) % {_INCR_MOD}
               = {_INCR_SLICE} AS incoming
      FROM uniq),
    base AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n_base_copies,
             CAST(MIN(doc_id) AS BIGINT) AS first_seen
      FROM tagged WHERE NOT incoming AND h IS NOT NULL GROUP BY h)
    SELECT t.doc_id,
           CAST(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS is_dup,
           COALESCE(b.n_base_copies, 0) AS n_base_copies,
           b.first_seen
    FROM tagged t LEFT JOIN base b ON t.h = b.h
    WHERE t.incoming
    """,
)
def d2_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D2: cross-snapshot incremental exact dedup — the "new crawl
    arrives, drop what the corpus already holds" shape. The incoming
    slice (portable non-negative residue ``doc_id % {_INCR_MOD} ==
    {_INCR_SLICE}``, hostile negative ids included deterministically)
    is checked by content hash against the base corpus; each incoming
    doc reports whether it is a duplicate, how many base copies exist,
    and the earliest base doc_id holding that content.

    Scale: the base side reduces to one (hash, count, min-id) row per
    distinct content BEFORE the join, so the join input is
    distinct-content-sized, not corpus-sized; the incoming slice is a
    pushed-down scan filter. AQE picks broadcast when the incoming
    snapshot is small (the common nightly-crawl case) and a hash join
    on ``h`` otherwise. The d8 Bloom-prune recipe (`pipeline.py`)
    composes in front of this to avoid shuffling the clean majority at
    100 TB; NULL texts hash to NULL and correctly never match
    (equality join), surviving the NULL-injection corpus.
    """
    docs = unique_full_docs(spark, sf).select(
        "doc_id", F.sha2("text", 256).alias("h")
    )
    pmod = ((F.col("doc_id") % _INCR_MOD) + _INCR_MOD) % _INCR_MOD
    tagged = docs.withColumn("incoming", pmod == _INCR_SLICE)
    base = (
        tagged.filter(~F.col("incoming") & F.col("h").isNotNull())
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_base_copies"),
            F.min("doc_id").cast("bigint").alias("first_seen"),
        )
    )
    inc = tagged.filter(F.col("incoming")).select("doc_id", "h")
    return inc.join(base, "h", "left").select(
        "doc_id",
        F.when(F.col("n_base_copies").isNull(), 0)
        .otherwise(1)
        .cast("int")
        .alias("is_dup"),
        F.coalesce(F.col("n_base_copies"), F.lit(0).cast("bigint")).alias(
            "n_base_copies"
        ),
        "first_seen",
    )


# -- B75: GROUPS window frame (emulated) --------------------------------


@query(
    "b75_groups_frame",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate NULLS LAST) AS grp
      FROM orders),
    f AS (
      SELECT o_orderpriority, yr, price_c,
             SUM(price_c) OVER w AS frame_total_c,
             COUNT(*)     OVER w AS frame_n
      FROM g
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY grp
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING))
    SELECT o_orderpriority, yr,
           CAST(COUNT(*) AS BIGINT)          AS n_rows,
           CAST(SUM(frame_total_c) AS BIGINT) AS sum_frame_total_c,
           CAST(MAX(frame_total_c) AS BIGINT) AS max_frame_total_c,
           CAST(SUM(frame_n) AS BIGINT)       AS sum_frame_n
    FROM f GROUP BY o_orderpriority, yr
    """,
)
def b75_groups_frame(spark: SparkSession, sf: str) -> DataFrame:
    """B75: GROUPS window frame — ``GROUPS BETWEEN 1 PRECEDING AND 1
    FOLLOWING`` (the SQL:2016 peer-group frame NEITHER engine ships:
    Spark has ROWS/RANGE only, DuckDB raises ParserException), emulated
    with the standard rewrite: ``dense_rank`` over the order key turns
    peer groups into consecutive integers, and an integer RANGE frame
    of ±1 on that rank IS the GROUPS frame. Every order sums the
    integer-cents totalprice of its own orderdate peer group plus the
    adjacent earlier/later dates within its priority class.

    Both engines run the same rewrite (cross-engine verified — no
    native GROUPS reference exists), and the per-row frame values are
    rolled up per (priority, year) so the verified output stays
    ~35 rows at any SF while still folding every row's frame sum into
    the checked aggregates. Duplicate orderkeys under hostile corpora
    are harmless: each row's frame value is a pure function of its
    (priority, orderdate) peer position, so copies contribute
    identical rows to the multiset on both engines.

    Scale: ONE Exchange on o_orderpriority (verified: the executed
    plan has a single shuffle; 5 partitions — skewed by design, and
    the two-level distrank rewrite applies if a priority class
    outgrows an executor), two window passes with two in-partition
    sorts (the grp sort is order-equivalent to the orderdate sort but
    Catalyst cannot prove it — no extra shuffle, one extra O(n log n)
    in-memory pass), then a ~35-key aggregate.
    """
    orders = load(spark, sf, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("price_c"),
        F.col("o_orderdate"),
    )
    wg = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_orderdate").asc_nulls_last()
    )
    g = orders.withColumn("grp", F.dense_rank().over(wg)).drop("o_orderdate")
    wf = (
        Window.partitionBy("o_orderpriority")
        .orderBy("grp")
        .rangeBetween(-1, 1)
    )
    f = g.select(
        "o_orderpriority",
        "yr",
        F.sum("price_c").over(wf).alias("frame_total_c"),
        F.count(F.lit(1)).over(wf).alias("frame_n"),
    )
    return f.groupBy("o_orderpriority", "yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("frame_total_c").cast("bigint").alias("sum_frame_total_c"),
        F.max("frame_total_c").cast("bigint").alias("max_frame_total_c"),
        F.sum("frame_n").cast("bigint").alias("sum_frame_n"),
    )


# -- D3: distributed PCA over the embedding table -----------------------

_PCA_K = 8
_PCA_DIM = 64  # the fixture's embedding width (all SFs); domain-declared


def pca_model(
    spark: SparkSession, sf: str, k: int = _PCA_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Distributed PCA model over ``embeddings.embedding``: returns
    ``(eigvals_desc[k], components[k, dim], mean[dim], n)``.

    Domain: vectors that are non-NULL, exactly {dim}-wide, and free of
    NULL/NaN components (the hostile-embeddings corpus classes inject
    all three) — the same vector-hygiene filter the d3 search family
    applies.

    Scale design: one Arrow-batched ``mapInPandas`` pass emits each
    batch's PARTIAL Gram upper triangle (dim·(dim+1)/2 doubles), column
    sums and row count as (i, j, s) rows; a single (i, j) groupBy
    reduces them and only the dim²-bounded model state is collected —
    the same bounded-collect contract as ``similarity.train_ivf_
    centroids`` (K×dim) and the PQ codebooks. No per-row data ever
    reaches the driver, and the reduce is map-side combinable. The
    driver then forms the population covariance C = G/n − μμᵀ and runs
    ``numpy.linalg.eigh`` on the dim×dim matrix (model-state math, like
    the IVF argmax). Float partial sums are partition-order sensitive
    at the ulp; every DOWNSTREAM consumer of this model is therefore
    either jitter-immune (the spectral invariants in
    ``d3_pca_variance``) or re-rounded (tests pin values to 1e-6 on
    the clean fixture, where Gram entries are O(n) and ulp noise is
    ~1e-10).
    """
    rows = pca_gram_terms(pca_domain(load(spark, sf, "embeddings"))).collect()
    return pca_model_from_terms(rows, k)


def pca_domain(emb: DataFrame) -> DataFrame:
    """The PCA vector-hygiene domain filter (see :func:`pca_model`)."""
    return emb.select("embedding").filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == _PCA_DIM)
        & ~F.expr("exists(embedding, x -> x IS NULL OR isnan(x))")
    )


def pca_gram_terms(emb: DataFrame) -> DataFrame:
    """The REDUCED (i, j, s) Gram-term frame for ``emb.embedding``:
    upper-triangle Gram entries, column sums (j = -1) and the row
    count (i = j = -1) — ≤ dim(dim+1)/2 + dim + 1 rows. Terms are
    ADDITIVE (merge = SUM), which is what makes them the streaming
    index state (`streaming/pca.py`): per-batch term shards sum to
    the corpus terms."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def gram(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            G = X.T @ X
            iu, ju = np.triu_indices(X.shape[1])
            out = {
                "i": list(iu) + list(range(X.shape[1])) + [-1],
                "j": list(ju) + [-1] * X.shape[1] + [-1],
                "s": list(G[iu, ju]) + list(X.sum(axis=0)) + [float(len(X))],
            }
            yield pd.DataFrame(out)

    return (
        emb.mapInPandas(gram, schema)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def pca_model_from_terms(
    rows, k: int = _PCA_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Driver-side model math over collected Gram-term rows — the
    64×64 covariance + ``numpy.linalg.eigh`` + the pinned sign
    convention. Shared by the batch model and the streaming read side
    so the definitions cannot drift."""
    G = np.zeros((_PCA_DIM, _PCA_DIM))
    m = np.zeros(_PCA_DIM)
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["s"])
        elif r["j"] == -1:
            m[r["i"]] = r["s"]
        else:
            G[r["i"], r["j"]] = r["s"]
            G[r["j"], r["i"]] = r["s"]
    if n == 0:
        return (
            np.zeros(k),
            np.zeros((k, _PCA_DIM)),
            np.zeros(_PCA_DIM),
            0,
        )
    mu = m / n
    C = G / n - np.outer(mu, mu)
    C = (C + C.T) / 2.0
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # deterministic sign convention: the largest-|.| component positive
    for r in range(comps.shape[0]):
        imax = int(np.argmax(np.abs(comps[r])))
        if comps[r, imax] < 0:
            comps[r] = -comps[r]
    return vals[order], comps, mu, n


@query(
    "d3_pca_variance",
    oracle=f"""
    SELECT 'n_vectors' AS metric,
           CAST(COUNT(*) AS BIGINT) AS value
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = {_PCA_DIM}
      AND len(list_filter(embedding,
                          x -> x IS NULL OR isnan(x))) = 0
    UNION ALL SELECT 'dim', {_PCA_DIM}
    UNION ALL SELECT 'pc1_dominates_axes', 1
    UNION ALL SELECT 'eigs_sorted_desc', 1
    UNION ALL SELECT 'components_orthonormal', 1
    """,
)
def d3_pca_variance(spark: SparkSession, sf: str) -> DataFrame:
    """D3: distributed PCA spectral audit — the embedding-whitening /
    dimensionality-reduction step ANN pipelines run before IVF/PQ
    (reducing 64→8 dims cuts index bandwidth 8× and decorrelates the
    quantizer's input). Emits the bounded-check form (the b13
    protocol): exact domain counts plus spectral invariants that are
    THEOREMS for a correct PCA — λ₁ ≥ every coordinate-axis variance
    (Rayleigh quotient at eᵢ), eigenvalues sorted descending,
    components orthonormal — so each boolean is immune to the float
    jitter of partial-sum order even under 1e20-magnitude hostile
    vectors, while an incorrect covariance/eigen implementation breaks
    them. The exact eigendecomposition values are pinned against a
    full-matrix numpy reference on the clean fixture in
    ``tests/test_corpus.py`` (same split as d3_ivf_topk: bounded-check
    oracle + precise pytest).

    Scale: see :func:`pca_model` — one Arrow pass, one dim²-bounded
    reduce, driver math on a 64×64 matrix. 100 TB of embeddings costs
    one scan.
    """
    vals, comps, mu, n = pca_model(spark, sf)
    # max per-axis variance: an INDEPENDENT built-in aggregate pass
    # (var_pop via posexplode, no UDF, same domain) — deliberately not
    # derived from the model's own covariance diagonal, so the check
    # also cross-validates the Arrow Gram pass against Catalyst's
    # var_pop.
    diag = (
        pca_domain(load(spark, sf, "embeddings"))
        .select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.var_pop("x").alias("v"))
        .agg(F.max("v").alias("vmax"))
        .collect()
    )
    axis_var_max = diag[0]["vmax"] if n > 0 and diag[0]["vmax"] is not None else 0.0
    tol = 1e-9 * max(1.0, abs(axis_var_max))
    pc1_dom = 1 if (n == 0 or vals[0] >= axis_var_max - tol) else 0
    sorted_desc = 1 if all(vals[i] >= vals[i + 1] - tol for i in range(len(vals) - 1)) else 0
    gram_err = np.abs(comps @ comps.T - np.eye(comps.shape[0])).max() if n > 0 else 0.0
    ortho = 1 if gram_err < 1e-8 else 0
    rows = [
        ("n_vectors", n),
        ("dim", _PCA_DIM),
        ("pc1_dominates_axes", pc1_dom),
        ("eigs_sorted_desc", sorted_desc),
        ("components_orthonormal", ortho),
    ]
    return spark.createDataFrame(
        [(m, int(v)) for m, v in rows], "metric string, value bigint"
    )
